"""Log analysis CLI (tools/analysis_tools/analyze_logs.py analog).

Parses the json-line train logs written by train.loop.JsonLogger:
``cal_train_time`` prints per-epoch iteration-time statistics
(:10-30 analog); ``plot_curve`` dumps metric curves as CSV (matplotlib-free
in this image).
"""
from __future__ import annotations

import argparse
import json
from collections import defaultdict


def load_records(path):
    with open(path) as f:
        return [json.loads(l) for l in f if l.strip()]


def cal_train_time(records):
    by_epoch = defaultdict(list)
    for r in records:
        if r.get("mode") == "train" and "time" in r:
            by_epoch[r["epoch"]].append(r["time"])
    print(f"{'epoch':>6} {'mean(s/iter)':>14} {'min':>8} {'max':>8}")
    alltimes = []
    for e in sorted(by_epoch):
        ts = by_epoch[e]
        alltimes += ts
        print(f"{e:>6} {sum(ts)/len(ts):>14.4f} {min(ts):>8.4f} "
              f"{max(ts):>8.4f}")
    if alltimes:
        print(f"overall mean: {sum(alltimes)/len(alltimes):.4f} s/iter")


def plot_curve(records, keys, out_csv):
    rows = []
    for r in records:
        if r.get("mode") != "train":
            continue
        row = [r.get("epoch"), r.get("iter")]
        row += [r.get(k) for k in keys]
        rows.append(row)
    with open(out_csv, "w") as f:
        f.write("epoch,iter," + ",".join(keys) + "\n")
        for row in rows:
            f.write(",".join("" if v is None else str(v) for v in row)
                    + "\n")
    print(f"wrote {len(rows)} rows to {out_csv}")


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    sub = ap.add_subparsers(dest="task", required=True)
    t = sub.add_parser("cal_train_time")
    t.add_argument("json_logs", nargs="+")
    p = sub.add_parser("plot_curve")
    p.add_argument("json_logs", nargs="+")
    p.add_argument("--keys", nargs="+", default=["loss_cls", "loss_bbox"])
    p.add_argument("--out", default="curve.csv")
    args = ap.parse_args(argv)

    for path in args.json_logs:
        records = load_records(path)
        print(f"== {path} ==")
        if args.task == "cal_train_time":
            cal_train_time(records)
        else:
            plot_curve(records, args.keys, args.out)


if __name__ == "__main__":
    main()
