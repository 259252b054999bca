"""Config sanity CLI (tools/misc/print_config.py analog)."""
from __future__ import annotations

import argparse
import json


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("preset")
    ap.add_argument("--cfg-options", nargs="*", default=[])
    args = ap.parse_args(argv)

    from transcar_tpu.cli.train import parse_overrides
    from transcar_tpu.core.config import config_to_dict, get_preset

    cfg = get_preset(args.preset, parse_overrides(args.cfg_options))
    print(json.dumps(config_to_dict(cfg), indent=2))


if __name__ == "__main__":
    main()
