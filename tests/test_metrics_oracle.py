"""Cross-validation of the native nuScenes evaluator (eval/metrics.py)
against an INDEPENDENT restatement of the devkit's metric pipeline
(VERDICT r3 item 4).

The oracle below restates ``nuscenes/eval/detection/algo.py``
(``accumulate`` / ``calc_ap`` / ``calc_tp``), the TP-error functions of
``eval/common/utils.py`` and the ``DetectionMetrics`` aggregation
properties from their published definitions — deliberately mirroring
the devkit's own control flow (sortind reversal, no-predictions early
returns, per-key interp), which is NOT how eval/metrics.py is written —
then property-tests the native evaluator on randomized multi-class
scenes, including every edge case the devkit handles specially:
zero predictions, all-FP scenes, npos==0 classes, score ties,
max-recall clipping, NaN GT velocities, empty attributes, and the
excluded (class, metric) pairs.
"""
import numpy as np
import pytest

from transcar_tpu.eval.metrics import (
    DETECTION_NAMES, DIST_THS, DIST_TH_TP, TP_METRICS, TP_EXCLUDE,
    accumulate, calc_ap, calc_tp, evaluate_detections)
from transcar_tpu.eval.submission import CLASS_RANGE, yaw_quat

NELEM = 101


# ----------------------------------------------------------- oracle


def _oracle_no_predictions():
    return {"recall": np.linspace(0, 1, NELEM),
            "precision": np.zeros(NELEM),
            "confidence": np.zeros(NELEM),
            **{m: np.ones(NELEM) for m in TP_METRICS}}


def _oracle_cummean(x):
    if np.all(np.isnan(x)):
        return np.ones(len(x))
    sum_vals = np.nancumsum(x.astype(float))
    count_vals = np.cumsum(~np.isnan(x))
    return np.divide(sum_vals, count_vals, out=np.zeros_like(sum_vals),
                     where=count_vals != 0)


def _oracle_center_distance(gt, pred):
    return np.linalg.norm(np.array(pred["translation"][:2])
                          - np.array(gt["translation"][:2]))


def _oracle_scale_iou(gt, pred):
    sa = np.array(gt["size"])
    sr = np.array(pred["size"])
    assert all(sa > 0) and all(sr > 0)
    min_wlh = np.minimum(sa, sr)
    inter = np.prod(min_wlh)
    union = np.prod(sa) + np.prod(sr) - inter
    return inter / union


def _oracle_yaw_diff(gt, pred, period):
    diff = (gt["yaw"] - pred["yaw"] + period / 2) % period - period / 2
    if diff > np.pi:
        diff = diff - (2 * np.pi)
    return abs(diff)


def _oracle_attr_acc(gt, pred):
    if gt["attribute_name"] == "":
        return np.nan
    return float(gt["attribute_name"] == pred["attribute_name"])


def _oracle_accumulate(gt_boxes, pred_boxes, class_name, dist_th):
    """Devkit algo.accumulate restated line-for-line from its published
    definition (different source than eval/metrics.py::accumulate)."""
    npos = len([1 for bl in gt_boxes.values() for b in bl
                if b["detection_name"] == class_name])
    if npos == 0:
        return _oracle_no_predictions()

    pred_boxes_list = [(b, tok) for tok, bl in pred_boxes.items()
                       for b in bl if b["detection_name"] == class_name]
    pred_confs = [b["detection_score"] for b, _ in pred_boxes_list]
    sortind = [i for (v, i) in sorted(
        (v, i) for (i, v) in enumerate(pred_confs))][::-1]

    tp, fp, conf = [], [], []
    match_data = {m: [] for m in TP_METRICS}
    match_data["conf"] = []
    taken = set()
    for ind in sortind:
        pred_box, sample_token = pred_boxes_list[ind]
        min_dist = np.inf
        match_gt_idx = None
        for gt_idx, gt_box in enumerate(gt_boxes[sample_token]):
            if (gt_box["detection_name"] == class_name
                    and (sample_token, gt_idx) not in taken):
                this_distance = _oracle_center_distance(gt_box, pred_box)
                if this_distance < min_dist:
                    min_dist = this_distance
                    match_gt_idx = gt_idx
        is_match = min_dist < dist_th
        if is_match:
            taken.add((sample_token, match_gt_idx))
            tp.append(1)
            fp.append(0)
            conf.append(pred_box["detection_score"])
            gt_box_match = gt_boxes[sample_token][match_gt_idx]
            match_data["trans_err"].append(
                _oracle_center_distance(gt_box_match, pred_box))
            match_data["vel_err"].append(np.linalg.norm(
                np.array(gt_box_match["velocity"])
                - np.array(pred_box["velocity"])))
            match_data["scale_err"].append(
                1 - _oracle_scale_iou(gt_box_match, pred_box))
            period = np.pi if class_name == "barrier" else 2 * np.pi
            match_data["orient_err"].append(
                _oracle_yaw_diff(gt_box_match, pred_box, period))
            match_data["attr_err"].append(
                1 - _oracle_attr_acc(gt_box_match, pred_box))
            match_data["conf"].append(pred_box["detection_score"])
        else:
            tp.append(0)
            fp.append(1)
            conf.append(pred_box["detection_score"])

    if len(match_data["trans_err"]) == 0:
        return _oracle_no_predictions()

    tp = np.cumsum(tp).astype(float)
    fp = np.cumsum(fp).astype(float)
    conf = np.array(conf)
    prec = tp / (fp + tp)
    rec = tp / float(npos)
    rec_interp = np.linspace(0, 1, NELEM)
    prec = np.interp(rec_interp, rec, prec, right=0)
    conf = np.interp(rec_interp, rec, conf, right=0)
    out = {"recall": rec_interp, "precision": prec, "confidence": conf}
    for key in match_data:
        if key == "conf":
            continue
        tmp = _oracle_cummean(np.array(match_data[key]))
        out[key] = np.interp(conf[::-1], match_data["conf"][::-1],
                             tmp[::-1])[::-1]
    return out


def _oracle_calc_ap(md, min_recall=0.1, min_precision=0.1):
    prec = np.copy(md["precision"])
    prec = prec[round(100 * min_recall) + 1:]
    prec -= min_precision
    prec[prec < 0] = 0
    return float(np.mean(prec)) / (1.0 - min_precision)


def _oracle_calc_tp(md, metric_name, min_recall=0.1):
    first_ind = round(100 * min_recall) + 1
    non_zero = np.nonzero(md["confidence"])[0]
    last_ind = 0 if len(non_zero) == 0 else non_zero[-1]
    if last_ind < first_ind:
        return 1.0
    return float(np.mean(md[metric_name][first_ind:last_ind + 1]))


def _oracle_filter(boxes, class_range):
    out = {}
    for tok, bl in boxes.items():
        kept = [b for b in bl
                if b["ego_dist"] < class_range[b["detection_name"]]]
        kept = [b for b in kept if b["num_pts"] != 0]
        out[tok] = kept
    return out


def _oracle_summary(gt_boxes, pred_boxes, class_names):
    """DetectionEval.evaluate + DetectionMetrics properties restated."""
    label_aps = {}
    label_tp = {}
    for class_name in class_names:
        label_aps[class_name] = {}
        for dist_th in DIST_THS:
            md = _oracle_accumulate(gt_boxes, pred_boxes, class_name,
                                    dist_th)
            label_aps[class_name][dist_th] = _oracle_calc_ap(md)
        md_tp = _oracle_accumulate(gt_boxes, pred_boxes, class_name,
                                   DIST_TH_TP)
        label_tp[class_name] = {}
        for metric_name in TP_METRICS:
            if (class_name == "traffic_cone" and metric_name in
                    ("attr_err", "vel_err", "orient_err")) or \
               (class_name == "barrier" and metric_name in
                    ("attr_err", "vel_err")):
                label_tp[class_name][metric_name] = np.nan
            else:
                label_tp[class_name][metric_name] = _oracle_calc_tp(
                    md_tp, metric_name)

    mean_dist_aps = {c: float(np.mean(list(label_aps[c].values())))
                     for c in class_names}
    mean_ap = float(np.mean(list(mean_dist_aps.values())))
    tp_errors = {}
    for metric_name in TP_METRICS:
        class_errors = [label_tp[c][metric_name] for c in class_names]
        with np.errstate(invalid="ignore"):
            tp_errors[metric_name] = float(np.nanmean(class_errors))
    tp_scores = {}
    for metric_name in TP_METRICS:
        score = 1.0 - tp_errors[metric_name]
        score = max(0.0, score)   # devkit: max(0.0, nan) -> 0.0
        tp_scores[metric_name] = score
    nd = float(5 * mean_ap + np.nansum(list(tp_scores.values())))
    nd = nd / float(5 + len(tp_scores))
    return {"label_aps": label_aps, "label_tp": label_tp,
            "mean_ap": mean_ap, "tp_errors": tp_errors, "nd_score": nd}


# ------------------------------------------------- scene generation


def _random_scene(rng, classes, n_samples=3, tie_scores=False,
                  all_fp=False, no_preds=False):
    """Randomized global-frame eval boxes (gts, preds) with every devkit
    field populated, plus the pkl-side (infos, results) encodings of the
    SAME scene for full-pipeline runs (identity lidar2ego/ego2global)."""
    gts, preds, infos, results = {}, {}, [], {}
    attr_pool = {"car": ["vehicle.moving", "vehicle.parked", ""],
                 "pedestrian": ["pedestrian.moving", ""],
                 "barrier": [""], "traffic_cone": [""]}
    for s in range(n_samples):
        tok = f"s{s}"
        gts[tok], preds[tok] = [], []
        g_rows, g_names, g_vel, g_attr, g_pts = [], [], [], [], []
        dets = []
        for cls in classes:
            for _ in range(int(rng.integers(0, 4))):
                # mostly in range, some beyond the class range
                r = rng.uniform(0, CLASS_RANGE[cls] * 1.3)
                th = rng.uniform(0, 2 * np.pi)
                center = np.array([r * np.cos(th), r * np.sin(th),
                                   rng.uniform(-2, 2)])
                size = rng.uniform(0.5, 4.0, 3)
                yaw = float(rng.uniform(-np.pi, np.pi))
                vel = rng.normal(size=2) * 3
                if rng.random() < 0.25:
                    vel = np.array([np.nan, np.nan])
                attr = attr_pool.get(cls, ["object.fixed", ""])[
                    int(rng.integers(0, len(attr_pool.get(cls, ["x", ""]))))]
                npts = int(rng.integers(0, 10))   # 0 sometimes → filtered
                gts[tok].append({
                    "translation": center, "size": size, "yaw": yaw,
                    "velocity": vel, "detection_name": cls,
                    "attribute_name": attr, "num_pts": npts,
                    "ego_dist": float(np.linalg.norm(center[:2]))})
                # pkl row: stored yaw = -nusc_yaw - pi/2 (identity poses)
                g_rows.append([*center, *size, -yaw - np.pi / 2])
                g_names.append(cls)
                g_vel.append(vel)
                g_attr.append(attr)
                g_pts.append(npts)
                # predictions: noisy copies of this GT
                if not no_preds and not all_fp:
                    for _ in range(int(rng.integers(0, 3))):
                        noise = rng.normal(size=2) * rng.choice(
                            [0.15, 0.8, 3.0])
                        ptr = center + np.array([*noise, 0.1])
                        score = float(rng.uniform(0.05, 1.0))
                        if tie_scores:
                            score = round(score, 1)
                        p_yaw = yaw + float(rng.normal() * 0.3)
                        p_vel = np.nan_to_num(vel) + rng.normal(size=2)
                        p_size = np.maximum(
                            size + rng.normal(size=3) * 0.3, 0.1)
                        p_attr = attr if rng.random() < 0.7 else "other"
                        preds[tok].append({
                            "translation": ptr, "size": p_size,
                            "yaw": p_yaw, "velocity": p_vel,
                            "detection_name": cls,
                            "detection_score": score,
                            "attribute_name": p_attr, "num_pts": -1,
                            "ego_dist": float(np.linalg.norm(ptr[:2]))})
                        dets.append({
                            "sample_token": tok,
                            "translation": ptr.tolist(),
                            "size": p_size.tolist(),
                            "rotation": yaw_quat(p_yaw),
                            "velocity": p_vel.tolist(),
                            "detection_name": cls,
                            "detection_score": score,
                            "attribute_name": p_attr})
            # pure false positives
            if not no_preds:
                for _ in range(int(rng.integers(0, 3))):
                    r = rng.uniform(0, CLASS_RANGE[cls])
                    th = rng.uniform(0, 2 * np.pi)
                    ptr = np.array([r * np.cos(th), r * np.sin(th), 0.0])
                    score = float(rng.uniform(0.05, 1.0))
                    if tie_scores:
                        score = round(score, 1)
                    p_size = rng.uniform(0.5, 4.0, 3)
                    p_yaw = float(rng.uniform(-np.pi, np.pi))
                    p_vel = rng.normal(size=2)
                    preds[tok].append({
                        "translation": ptr, "size": p_size, "yaw": p_yaw,
                        "velocity": p_vel, "detection_name": cls,
                        "detection_score": score, "attribute_name": "",
                        "num_pts": -1,
                        "ego_dist": float(np.linalg.norm(ptr[:2]))})
                    dets.append({
                        "sample_token": tok, "translation": ptr.tolist(),
                        "size": p_size.tolist(),
                        "rotation": yaw_quat(p_yaw),
                        "velocity": p_vel.tolist(),
                        "detection_name": cls,
                        "detection_score": score, "attribute_name": ""})
        infos.append({
            "token": tok,
            "gt_boxes": np.array(g_rows, np.float64).reshape(-1, 7),
            "gt_names": g_names,
            "gt_velocity": np.array(g_vel, np.float64).reshape(-1, 2),
            "gt_attrs": g_attr,
            "num_lidar_pts": np.array(g_pts, np.int64),
            "num_radar_pts": np.zeros(len(g_pts), np.int64),
            "lidar2ego_translation": [0.0, 0.0, 0.0],
            "lidar2ego_rotation": [1.0, 0.0, 0.0, 0.0],
            "ego2global_translation": [0.0, 0.0, 0.0],
            "ego2global_rotation": [1.0, 0.0, 0.0, 0.0],
        })
        results[tok] = dets
    return gts, preds, infos, results


def _assert_md_equal(got, want, ctx):
    np.testing.assert_allclose(got["precision"], want["precision"],
                               atol=1e-12, err_msg=f"{ctx} precision")
    np.testing.assert_allclose(got["confidence"], want["confidence"],
                               atol=1e-12, err_msg=f"{ctx} confidence")
    for m in TP_METRICS:
        np.testing.assert_allclose(got[m], want[m], atol=1e-9,
                                   err_msg=f"{ctx} {m}")


CLASS_POOL = [
    ("car", "pedestrian", "barrier", "traffic_cone"),
    ("truck", "bus", "bicycle", "motorcycle"),
    ("car", "trailer", "construction_vehicle", "barrier"),
    DETECTION_NAMES,
]


def test_accumulate_matches_devkit_oracle_on_randomized_scenes():
    """≥100 randomized scenes: every (class, dist_th) curve set equals
    the independent devkit restatement bit-for-bit (same float ops)."""
    rng = np.random.default_rng(0)
    n_scenes = 110
    n_nontrivial = 0
    for i in range(n_scenes):
        classes = CLASS_POOL[i % len(CLASS_POOL)]
        gts, preds, _, _ = _random_scene(
            rng, classes, n_samples=int(rng.integers(1, 4)),
            tie_scores=(i % 5 == 0), all_fp=(i % 17 == 0),
            no_preds=(i % 23 == 0))
        for cls in classes:
            for th in DIST_THS:
                got = accumulate(gts, preds, cls, th)
                want = _oracle_accumulate(gts, preds, cls, th)
                _assert_md_equal(got, want, f"scene{i}/{cls}/{th}")
                ap_g, ap_w = calc_ap(got), _oracle_calc_ap(want)
                np.testing.assert_allclose(ap_g, ap_w, atol=1e-12)
                if ap_w > 0:
                    n_nontrivial += 1
                for m in TP_METRICS:
                    np.testing.assert_allclose(
                        calc_tp(got, m), _oracle_calc_tp(want, m),
                        atol=1e-12, err_msg=f"scene{i}/{cls}/{th}/{m}")
    assert n_nontrivial > 200, "not enough non-vacuous AP comparisons"


def test_full_pipeline_matches_devkit_oracle_summary():
    """Submission-format results + infos pkl through evaluate_detections
    == oracle filter + oracle accumulate + DetectionMetrics aggregation,
    on 30 randomized multi-class scenes (mAP, NDS, every label AP, every
    TP error including the excluded-pair NaNs)."""
    rng = np.random.default_rng(1)
    n_scenes = 30
    nontrivial_maps = 0
    for i in range(n_scenes):
        classes = CLASS_POOL[i % len(CLASS_POOL)]
        gts, preds, infos, results = _random_scene(
            rng, classes, n_samples=int(rng.integers(2, 4)),
            tie_scores=(i % 4 == 0))
        got = evaluate_detections(results, infos, class_names=classes)
        want = _oracle_summary(_oracle_filter(gts, CLASS_RANGE),
                               _oracle_filter(preds, CLASS_RANGE),
                               classes)
        np.testing.assert_allclose(got["mean_ap"], want["mean_ap"],
                                   atol=1e-9, err_msg=f"scene{i} mAP")
        np.testing.assert_allclose(got["nd_score"], want["nd_score"],
                                   atol=1e-9, err_msg=f"scene{i} NDS")
        for c in classes:
            for th in DIST_THS:
                np.testing.assert_allclose(
                    got["label_aps"][c][th], want["label_aps"][c][th],
                    atol=1e-9, err_msg=f"scene{i}/{c}/{th}")
            for m in TP_METRICS:
                g = got["label_tp_errors"][c][m]
                w = want["label_tp"][c][m]
                if np.isnan(w):
                    assert np.isnan(g), (i, c, m)
                else:
                    np.testing.assert_allclose(
                        g, w, atol=1e-9, err_msg=f"scene{i}/{c}/{m}")
        for m in TP_METRICS:
            g, w = got["tp_errors"][m], want["tp_errors"][m]
            if np.isnan(w):
                assert np.isnan(g), (i, m)
            else:
                np.testing.assert_allclose(g, w, atol=1e-9,
                                           err_msg=f"scene{i} {m}")
        if want["mean_ap"] > 0.05:
            nontrivial_maps += 1
    assert nontrivial_maps > 10, "scenes too degenerate to be probative"


def test_edge_cases_zero_preds_all_fp_and_missing_class():
    rng = np.random.default_rng(2)
    classes = ("car", "pedestrian")
    # zero predictions anywhere
    gts, preds, infos, results = _random_scene(rng, classes, no_preds=True)
    got = evaluate_detections(results, infos, class_names=classes)
    assert got["mean_ap"] == 0.0
    for m in TP_METRICS:
        assert got["tp_errors"][m] == 1.0
    np.testing.assert_allclose(
        got["nd_score"],
        _oracle_summary(_oracle_filter(gts, CLASS_RANGE),
                        _oracle_filter(preds, CLASS_RANGE),
                        classes)["nd_score"], atol=1e-12)
    # all false positives: AP 0, TP errors 1 — and oracle agrees
    gts, preds, infos, results = _random_scene(rng, classes, all_fp=True)
    got = evaluate_detections(results, infos, class_names=classes)
    want = _oracle_summary(_oracle_filter(gts, CLASS_RANGE),
                           _oracle_filter(preds, CLASS_RANGE), classes)
    np.testing.assert_allclose(got["mean_ap"], want["mean_ap"],
                               atol=1e-12)
    np.testing.assert_allclose(got["nd_score"], want["nd_score"],
                               atol=1e-12)
    # class evaluated but absent from GT AND preds (npos==0 path)
    got = evaluate_detections(results, infos,
                              class_names=("car", "bus"))
    assert got["label_aps"]["bus"][2.0] == 0.0
    assert got["label_tp_errors"]["bus"]["trans_err"] == 1.0
