"""Native nuScenes detection-metric evaluator (eval/metrics.py).

Analytic oracle tests: every expected value below is hand-computed from
the published metric definition (nuScenes CVPR 2019 §3.1 /
detection_cvpr_2019 config) that the devkit's NuScenesEval implements —
the devkit itself is not installed in CI, which is exactly why the
native evaluator exists (reference tools/test.py:233-242 delegates to
it and therefore cannot evaluate without the raw dataset).
"""
import numpy as np
import pytest

from transcar_tpu.eval.metrics import (
    DIST_THS, accumulate, calc_ap, calc_tp, evaluate_detections,
    filter_eval_boxes, gt_from_infos, preds_from_results, quaternion_yaw)
from transcar_tpu.eval.submission import (
    detections_to_nusc_annos, quat_to_rot, yaw_quat)

IDENT = [1.0, 0.0, 0.0, 0.0]


def mk_info(token, boxes, extra=None):
    """Identity-pose info entry: lidar == ego == global frame.

    boxes: list of (x, y, z_gravity, w, l, h, global_yaw, vx, vy, name).
    Stored pkl yaw uses the converter convention  -yaw - π/2
    (cli/create_data.py:138).
    """
    gt = np.array([[x, y, z, w, l, h, -yaw - np.pi / 2]
                   for (x, y, z, w, l, h, yaw, vx, vy, n) in boxes],
                  np.float64).reshape(-1, 7)
    info = {
        "token": token,
        "lidar2ego_rotation": IDENT, "lidar2ego_translation": [0, 0, 0],
        "ego2global_rotation": IDENT, "ego2global_translation": [0, 0, 0],
        "gt_boxes": gt,
        "gt_names": [b[9] for b in boxes],
        "gt_velocity": np.array([[b[7], b[8]] for b in boxes],
                                np.float64).reshape(-1, 2),
        "num_lidar_pts": np.array([10] * len(boxes)),
        "num_radar_pts": np.array([0] * len(boxes)),
    }
    info.update(extra or {})
    return info


def mk_pred(token, x, y, z, w, l, h, yaw, vx, vy, name, score,
            attr=""):
    return {
        "sample_token": token, "translation": [x, y, z],
        "size": [w, l, h], "rotation": yaw_quat(yaw),
        "velocity": [vx, vy], "detection_name": name,
        "detection_score": score, "attribute_name": attr,
    }


CAR = dict(w=2.0, l=4.5, h=1.6)


def car_box(x, y, yaw=0.0, vx=0.0, vy=0.0, name="car"):
    return (x, y, 1.0, CAR["w"], CAR["l"], CAR["h"], yaw, vx, vy, name)


def car_pred(token, x, y, score, yaw=0.0, vx=0.0, vy=0.0, name="car",
             attr="", dw=0.0, dl=0.0, dh=0.0):
    return mk_pred(token, x, y, 1.0, CAR["w"] + dw, CAR["l"] + dl,
                   CAR["h"] + dh, yaw, vx, vy, name, score, attr)


def test_perfect_predictions_score_one():
    attrs = {"gt_attrs": ["vehicle.parked", "vehicle.parked"]}
    infos = [mk_info(f"s{i}", [car_box(5 + i, 0), car_box(-8, 3 * i)],
                     extra=attrs) for i in range(3)]
    results = {}
    for i in range(3):
        results[f"s{i}"] = [
            car_pred(f"s{i}", 5 + i, 0, 0.9 - 0.01 * i,
                     attr="vehicle.parked"),
            car_pred(f"s{i}", -8, 3 * i, 0.8 - 0.01 * i,
                     attr="vehicle.parked")]
    m = evaluate_detections(results, infos, class_names=("car",))
    assert m["mean_ap"] == pytest.approx(1.0)
    for th in DIST_THS:
        assert m["label_aps"]["car"][th] == pytest.approx(1.0)
    for k in ("trans_err", "scale_err", "orient_err", "vel_err",
              "attr_err"):
        assert m["tp_errors"][k] == pytest.approx(0.0), k
    assert m["nd_score"] == pytest.approx(1.0)


def test_distance_threshold_banding_and_ate():
    # one GT car; the only pred sits 1.5 m off → matches at 2 m and 4 m
    # only → per-threshold APs (0, 0, 1, 1), mAP 0.5, ATE exactly 1.5
    infos = [mk_info("s0", [car_box(0, 0)])]
    results = {"s0": [car_pred("s0", 0.0, 1.5, 0.9)]}
    m = evaluate_detections(results, infos, class_names=("car",))
    aps = m["label_aps"]["car"]
    assert aps[0.5] == pytest.approx(0.0)
    assert aps[1.0] == pytest.approx(0.0)
    assert aps[2.0] == pytest.approx(1.0)
    assert aps[4.0] == pytest.approx(1.0)
    assert m["mean_ap"] == pytest.approx(0.5)
    assert m["tp_errors"]["trans_err"] == pytest.approx(1.5)
    # NDS by hand: ATE 1.5 → score 0; ASE/AOE/AVE/AAE 0 (AAE: no GT
    # attrs → all-NaN error curve → calc_tp 1.0 → score 0):
    # (5·0.5 + 0 + 1 + 1 + 1 + 0) / 10
    assert m["tp_errors"]["scale_err"] == pytest.approx(0.0)
    assert m["nd_score"] == pytest.approx((2.5 + 3.0) / 10.0)


def test_greedy_matching_is_score_ordered():
    # G1 at origin, G2 unreachable at 20 m; the HIGH-score pred is 1.9 m
    # out, the low-score pred 0.1 m.  Score-greedy matching takes the
    # 1.9 m pred first (ATE 1.9); nearest-first would give 0.1.
    infos = [mk_info("s0", [car_box(0, 0), car_box(20, 0)])]
    results = {"s0": [car_pred("s0", 0.0, 1.9, 0.9),
                      car_pred("s0", 0.0, 0.1, 0.5)]}
    m = evaluate_detections(results, infos, class_names=("car",))
    assert m["tp_errors"]["trans_err"] == pytest.approx(1.9)


def test_ap_interpolation_mixed_precision():
    # 4 GT, 3 preds: scores .9 (TP), .8 (FP, 10 m off), .7 (TP).
    # recall steps (.25, .25, .5), precision (1, .5, 2/3).  101-pt
    # interpolated precision: 1 for r ≤ .25, linear .5→2/3 on (.25,.5],
    # 0 beyond.  AP = Σ max(p−.1,0)/90/.9 over recall bins 11..100.
    infos = [mk_info("s0", [car_box(0, 0), car_box(10, 0),
                            car_box(0, 10), car_box(-10, 0)])]
    results = {"s0": [car_pred("s0", 0.0, 0.2, 0.9),
                      car_pred("s0", 5.0, 5.0, 0.8),
                      car_pred("s0", 10.0, 0.3, 0.7)]}
    m = evaluate_detections(results, infos, class_names=("car",))
    rec = np.linspace(0, 1, 101)
    prec = np.interp(rec, [0.25, 0.25, 0.5], [1.0, 0.5, 2.0 / 3.0],
                     right=0)
    expected = float(np.mean(np.clip(prec[11:] - 0.1, 0, None))) / 0.9
    assert m["label_aps"]["car"][4.0] == pytest.approx(expected)


def test_scale_error_aligned_iou():
    # pred doubles the height: aligned IoU = V/(2V − V)… with h 1.6→3.2:
    # inter = w·l·1.6, union = w·l·3.2 → IoU .5 → ASE .5
    infos = [mk_info("s0", [car_box(0, 0)])]
    results = {"s0": [car_pred("s0", 0, 0, 0.9, dh=CAR["h"])]}
    m = evaluate_detections(results, infos, class_names=("car",))
    assert m["tp_errors"]["scale_err"] == pytest.approx(0.5)


def test_orientation_error_and_barrier_period():
    # car flipped by π → AOE π; barrier has period π → AOE 0
    infos = [mk_info("s0", [car_box(0, 0, yaw=0.3),
                            (5, 5, 0.5, 0.5, 2.0, 1.0, 0.2, 0, 0,
                             "barrier")])]
    results = {
        "s0": [car_pred("s0", 0, 0, 0.9, yaw=0.3 + np.pi),
               mk_pred("s0", 5, 5, 0.5, 0.5, 2.0, 1.0, 0.2 + np.pi,
                       0, 0, "barrier", 0.9)]}
    m = evaluate_detections(results, infos,
                            class_names=("car", "barrier"))
    assert m["label_tp_errors"]["car"]["orient_err"] == \
        pytest.approx(np.pi)
    assert m["label_tp_errors"]["barrier"]["orient_err"] == \
        pytest.approx(0.0, abs=1e-9)
    # barrier AVE/AAE are undefined by the metric config
    assert np.isnan(m["label_tp_errors"]["barrier"]["vel_err"])
    assert np.isnan(m["label_tp_errors"]["barrier"]["attr_err"])


def test_velocity_and_attribute_errors():
    extra = {"gt_attrs": ["vehicle.moving"]}
    infos = [mk_info("s0", [car_box(0, 0, vx=3.0, vy=4.0)], extra=extra)]
    results = {"s0": [car_pred("s0", 0, 0, 0.9, vx=3.0, vy=0.0,
                               attr="vehicle.parked")]}
    m = evaluate_detections(results, infos, class_names=("car",))
    assert m["tp_errors"]["vel_err"] == pytest.approx(4.0)
    assert m["tp_errors"]["attr_err"] == pytest.approx(1.0)
    # right attribute → zero error
    results = {"s0": [car_pred("s0", 0, 0, 0.9, vx=3.0, vy=4.0,
                               attr="vehicle.moving")]}
    m = evaluate_detections(results, infos, class_names=("car",))
    assert m["tp_errors"]["vel_err"] == pytest.approx(0.0)
    assert m["tp_errors"]["attr_err"] == pytest.approx(0.0)


def test_class_range_and_zero_point_filters():
    # traffic_cone at 35 m (range 30) is filtered on BOTH sides; a car
    # with zero lidar+radar points drops from GT but a matching pred
    # (num_pts −1) survives and becomes an unmatched FP
    cone = (35.0, 0, 0.5, 0.4, 0.4, 0.8, 0.0, 0, 0, "traffic_cone")
    infos = [mk_info("s0", [cone, car_box(5, 0)],
                     extra={"num_lidar_pts": np.array([5, 0]),
                            "num_radar_pts": np.array([0, 0])})]
    gts = filter_eval_boxes(gt_from_infos(infos))
    assert gts["s0"] == []    # cone out of range, car has zero points

    results = {"s0": [
        mk_pred("s0", 35.0, 0, 0.5, 0.4, 0.4, 0.8, 0.0, 0, 0,
                "traffic_cone", 0.9),
        car_pred("s0", 5, 0, 0.8)]}
    preds = filter_eval_boxes(preds_from_results(results, infos))
    assert [b["detection_name"] for b in preds["s0"]] == ["car"]


def test_no_predictions_and_absent_class():
    infos = [mk_info("s0", [car_box(0, 0)])]
    m = evaluate_detections({"s0": []}, infos,
                            class_names=("car", "bus"))
    assert m["mean_ap"] == pytest.approx(0.0)
    for cls in ("car", "bus"):
        assert m["label_tp_errors"][cls]["trans_err"] == 1.0
    assert m["nd_score"] == pytest.approx(0.0)


def test_raw_category_names_are_mapped():
    # mmdet3d-style pkls store raw nuScenes categories; unmappable
    # categories are skipped, like devkit load_gt
    box = (3.0, 0, 1.0, 2.0, 4.5, 1.6, 0.0, 0, 0, "vehicle.car")
    junk = (6.0, 0, 1.0, 1.0, 1.0, 1.0, 0.0, 0, 0, "animal")
    gts = gt_from_infos([mk_info("s0", [box, junk])])
    assert [b["detection_name"] for b in gts["s0"]] == ["car"]


def test_gt_and_submission_paths_agree_in_global_frame():
    """The GT lift (metrics.gt_from_infos) and the detection lift
    (submission.detections_to_nusc_annos) must land the SAME physical
    box on the SAME global-frame translation/size/yaw/velocity — with
    non-trivial lidar2ego / ego2global poses.  Pins the w/l passthrough
    (mmdet3d-0.17 output_to_nusc_box keeps dims order; the 1.x
    ``dims[[1,0,2]]`` reorder does not apply to this codebase's pkl
    convention)."""
    rng = np.random.default_rng(0)
    q1 = rng.normal(size=4)
    q1 /= np.linalg.norm(q1)
    q2 = rng.normal(size=4)
    q2 /= np.linalg.norm(q2)
    info = mk_info("s0", [car_box(8.0, -3.0, yaw=0.7, vx=1.0, vy=-2.0)])
    info.update({
        "lidar2ego_rotation": list(q1),
        "lidar2ego_translation": [0.9, -0.1, 1.8],
        "ego2global_rotation": list(q2),
        "ego2global_translation": [100.0, 200.0, 0.0],
    })
    gt = gt_from_infos([info])["s0"][0]

    # same box through the detection path: pkl row → bottom-z internal
    # box9 (data/infos._annotations semantics) → submission annos
    row = np.asarray(info["gt_boxes"][0], np.float64)
    box9 = np.concatenate([
        [row[0], row[1], row[2] - row[5] / 2.0], row[3:7], [1.0, -2.0]])
    annos = detections_to_nusc_annos(
        box9[None], np.array([0.9]), np.array([0]), np.array([True]),
        info, ["car"])
    assert len(annos) == 1
    a = annos[0]
    np.testing.assert_allclose(a["translation"], gt["translation"],
                               atol=1e-9)
    np.testing.assert_allclose(a["size"], gt["size"], atol=1e-12)
    np.testing.assert_allclose(a["velocity"], gt["velocity"], atol=1e-9)
    dyaw = (quaternion_yaw(a["rotation"]) - gt["yaw"] + np.pi) \
        % (2 * np.pi) - np.pi
    assert abs(dyaw) < 1e-9


def test_evaluate_native_end_to_end(tmp_path):
    import json
    infos = [mk_info("s0", [car_box(5, 0)]),
             mk_info("s1", [car_box(-5, 2)])]
    results = {"s0": [car_pred("s0", 5, 0, 0.9)],
               "s1": [car_pred("s1", -5, 2, 0.8)]}
    sub = tmp_path / "sub.json"
    sub.write_text(json.dumps({"meta": {}, "results": results}))
    import pickle
    ann = tmp_path / "infos.pkl"
    ann.write_bytes(pickle.dumps({"infos": infos, "metadata": {}}))

    from transcar_tpu.eval.metrics import evaluate_native
    m = evaluate_native(str(sub), ann_file=str(ann))
    # only car present out of 10 classes → mAP = 1/10; TP errors average
    # over all 10 classes — car is perfect (0), the 9 absent classes
    # never reach min recall and report the worst case 1.0 → 0.9
    assert m["mAP"] == pytest.approx(0.1)
    assert m["mATE"] == pytest.approx(0.9)
    assert m["mASE"] == pytest.approx(0.9)
    assert set(m) == {"mAP", "NDS", "mATE", "mASE", "mAOE", "mAVE",
                      "mAAE", "coverage"}
    assert m["coverage"] == pytest.approx(1.0)


def test_tp_below_min_recall_is_worst_case():
    # 20 GT, 1 matched pred → max recall 0.05 < min_recall 0.1 → every
    # TP error reports the worst-case 1.0
    boxes = [car_box(5 * i, 0) for i in range(20)]
    infos = [mk_info("s0", boxes)]
    results = {"s0": [car_pred("s0", 0, 0.4, 0.9)]}
    m = evaluate_detections(results, infos, class_names=("car",))
    assert m["tp_errors"]["trans_err"] == 1.0
    assert m["tp_errors"]["scale_err"] == 1.0


def test_nan_gt_velocity_excluded_from_ave():
    # devkit semantics: a GT with NaN velocity (single-frame object, no
    # neighbor to difference against) contributes NaN to vel_err, which
    # the NaN-aware cummean SKIPS — it must not count the prediction's
    # full |v| as error (ADVICE r3 medium)
    infos = [mk_info("s0", [car_box(5, 0, vx=np.nan, vy=np.nan),
                            car_box(-8, 3, vx=1.0, vy=0.0)])]
    # both matched; pred velocities: (3, 4) on the NaN GT (|err| would be
    # 5 if wrongly zeroed), exact (1, 0) on the valid GT
    results = {"s0": [car_pred("s0", 5, 0, 0.9, vx=3.0, vy=4.0),
                      car_pred("s0", -8, 3, 0.8, vx=1.0, vy=0.0)]}
    m = evaluate_detections(results, infos, class_names=("car",))
    assert m["tp_errors"]["vel_err"] == pytest.approx(0.0)


def test_unknown_pred_class_is_skipped_not_keyerror():
    infos = [mk_info("s0", [car_box(5, 0)])]
    results = {"s0": [car_pred("s0", 5, 0, 0.9),
                      car_pred("s0", 1, 1, 0.8, name="space_elevator")]}
    m = evaluate_detections(results, infos, class_names=("car",))
    assert m["label_aps"]["car"][2.0] == pytest.approx(1.0)


def test_partial_submission_reports_coverage_and_warns(tmp_path):
    import json, pickle
    infos = [mk_info("s0", [car_box(5, 0)]),
             mk_info("s1", [car_box(-5, 2)])]
    results = {"s0": [car_pred("s0", 5, 0, 0.9)]}  # s1 missing
    sub = tmp_path / "sub.json"
    sub.write_text(json.dumps({"meta": {}, "results": results}))
    ann = tmp_path / "infos.pkl"
    ann.write_bytes(pickle.dumps({"infos": infos, "metadata": {}}))
    from transcar_tpu.eval.metrics import evaluate_native
    with pytest.warns(UserWarning, match="PARTIAL"):
        m = evaluate_native(str(sub), ann_file=str(ann))
    assert m["coverage"] == pytest.approx(0.5)
