"""2D-annotation export (data/export2d.py) vs scipy/analytic oracles and a
fake duck-typed nuScenes DB (the devkit is absent from this container)."""
import json
import pickle

import numpy as np
import pytest

from transcar_tpu.data import export2d as e2

scipy_rot = pytest.importorskip("scipy.spatial.transform").Rotation


# ---------------------------------------------------------------------------
# quaternion helpers vs scipy
# ---------------------------------------------------------------------------

def _rand_quat(rng):
    q = rng.normal(size=4)
    return q / np.linalg.norm(q)


def test_quat_rot_mat_vs_scipy():
    rng = np.random.default_rng(0)
    for _ in range(20):
        q = _rand_quat(rng)                      # wxyz
        ours = e2.quat_rot_mat(q)
        ref = scipy_rot.from_quat([q[1], q[2], q[3], q[0]]).as_matrix()
        np.testing.assert_allclose(ours, ref, atol=1e-12)


def test_quat_mul_and_inv_vs_scipy():
    rng = np.random.default_rng(1)
    for _ in range(20):
        a, b = _rand_quat(rng), _rand_quat(rng)
        ra = scipy_rot.from_quat([a[1], a[2], a[3], a[0]])
        rb = scipy_rot.from_quat([b[1], b[2], b[3], b[0]])
        np.testing.assert_allclose(
            e2.quat_rot_mat(e2.quat_mul(a, b)), (ra * rb).as_matrix(),
            atol=1e-12)
        np.testing.assert_allclose(
            e2.quat_rot_mat(e2.quat_inv(a)), ra.inv().as_matrix(),
            atol=1e-12)


def test_quat_yaw_vs_scipy():
    rng = np.random.default_rng(2)
    for _ in range(20):
        q = _rand_quat(rng)
        ref_yaw = scipy_rot.from_quat(
            [q[1], q[2], q[3], q[0]]).as_euler("ZYX")[0]
        assert abs(e2.quat_yaw(q) - ref_yaw) < 1e-10


# ---------------------------------------------------------------------------
# hull ∩ canvas bbox
# ---------------------------------------------------------------------------

def test_post_process_coords_inside():
    pts = [[10, 20], [100, 20], [100, 80], [10, 80], [50, 50]]
    assert e2.post_process_coords(pts) == (10, 20, 100, 80)


def test_post_process_coords_clipped():
    # corners extend past every edge; intersection is the full canvas bbox
    pts = [[-50, -50], [2000, -50], [2000, 1000], [-50, 1000]]
    assert e2.post_process_coords(pts) == (0, 0, 1600, 900)


def test_post_process_coords_outside():
    assert e2.post_process_coords([[-10, -10], [-5, -10], [-7, -2]]) is None
    assert e2.post_process_coords(
        [[1700, 100], [1900, 100], [1800, 300]]) is None


def test_post_process_coords_partial_clip_matches_sampling():
    """Randomized oracle: bbox of densely sampled hull-boundary points
    clipped to the canvas (+ canvas-corner containment)."""
    rng = np.random.default_rng(3)
    for _ in range(30):
        pts = rng.uniform(-400, 2000, (8, 2)) * [1, 0.6]
        got = e2.post_process_coords(pts.tolist())
        hull = e2._convex_hull(pts)
        if len(hull) < 3:
            continue
        # sample the hull boundary + interior grid
        samples = []
        for i in range(len(hull)):
            a, b = hull[i], hull[(i + 1) % len(hull)]
            t = np.linspace(0, 1, 4000)[:, None]
            samples.append(a + t * (b - a))
        bound = np.concatenate(samples)
        inside = bound[(bound[:, 0] >= 0) & (bound[:, 0] <= 1600)
                       & (bound[:, 1] >= 0) & (bound[:, 1] <= 900)]
        # canvas corners inside the hull also bound the intersection
        corners = np.array([[0, 0], [1600, 0], [1600, 900], [0, 900]],
                           np.float64)

        def in_hull(p):
            for i in range(len(hull)):
                a, b = hull[i], hull[(i + 1) % len(hull)]
                if e2._cross2(b - a, p - a) < -1e-9:
                    return False
            return True

        pool = [inside] + [c[None] for c in corners if in_hull(c)]
        pool = np.concatenate(pool) if any(len(p) for p in pool) else \
            np.zeros((0, 2))
        if len(pool) == 0:
            assert got is None
            continue
        ref = (pool[:, 0].min(), pool[:, 1].min(),
               pool[:, 0].max(), pool[:, 1].max())
        assert got is not None
        np.testing.assert_allclose(got, ref, atol=1.0)


# ---------------------------------------------------------------------------
# fake nuScenes DB: get_2d_boxes + export_2d_annotation end-to-end
# ---------------------------------------------------------------------------

class FakeNusc:
    """Duck-typed DB with one sample / one camera / two annotations."""

    def __init__(self):
        self.tables = {
            "sample_data": {"sd_cam": {
                "sample_token": "samp0",
                "calibrated_sensor_token": "cs0",
                "ego_pose_token": "pose0",
                "filename": "samples/CAM_FRONT/img0.jpg",
            }},
            "sample": {"samp0": {"anns": ["ann0", "ann1"]}},
            "calibrated_sensor": {"cs0": {
                "translation": [0.0, 0.0, 0.0],
                "rotation": [1.0, 0.0, 0.0, 0.0],
                "camera_intrinsic": [[800.0, 0, 800], [0, 800.0, 450],
                                     [0, 0, 1]],
            }},
            "ego_pose": {"pose0": {
                "translation": [0.0, 0.0, 0.0],
                "rotation": [1.0, 0.0, 0.0, 0.0],
            }},
            "sample_annotation": {
                "ann0": {   # box straight ahead at depth 5
                    "translation": [0.0, 0.0, 5.0],
                    "size": [2.0, 4.0, 1.5],        # wlh
                    "rotation": [1.0, 0.0, 0.0, 0.0],
                    "visibility_token": "3",
                    "category_name": "vehicle.car",
                    "attribute_tokens": ["attr_mov"],
                },
                "ann1": {   # behind the camera → dropped
                    "translation": [0.0, 0.0, -5.0],
                    "size": [2.0, 4.0, 1.5],
                    "rotation": [1.0, 0.0, 0.0, 0.0],
                    "visibility_token": "4",
                    "category_name": "vehicle.car",
                    "attribute_tokens": [],
                },
            },
            "attribute": {"attr_mov": {"name": "vehicle.moving"}},
        }

    def get(self, table, token):
        return self.tables[table][token]

    def box_velocity(self, token):
        return np.array([1.0, 0.5, 0.0])


def test_get_2d_boxes_projection_and_mono3d():
    recs = e2.get_2d_boxes(FakeNusc(), "sd_cam",
                           visibilities=["", "1", "2", "3", "4"])
    assert len(recs) == 1                 # behind-camera ann dropped
    rec = recs[0]
    # corners x∈±2 (l), y∈±1 (w), z∈5±0.75 → u = 800x/z+800, v = 800y/z+450
    x1, y1, w2d, h2d = rec["bbox"]
    np.testing.assert_allclose(x1, 800 - 800 * 2 / 4.25, atol=1e-6)
    np.testing.assert_allclose(x1 + w2d, 800 + 800 * 2 / 4.25, atol=1e-6)
    np.testing.assert_allclose(y1, 450 - 800 * 1 / 4.25, atol=1e-6)
    assert rec["category_name"] == "car"
    assert rec["attribute_name"] == "vehicle.moving"
    np.testing.assert_allclose(rec["center2d"], [800, 450, 5], atol=1e-9)
    # loc + lhw dims + [-yaw]
    np.testing.assert_allclose(rec["bbox_cam3d"],
                               [0, 0, 5, 4, 1.5, 2, 0], atol=1e-12)
    # identity transforms: cam velocity = global (x, z) components
    np.testing.assert_allclose(rec["velo_cam3d"], [1.0, 0.0], atol=1e-12)


def test_export_2d_annotation_coco_json(tmp_path):
    cam_info = {
        "sample_data_token": "sd_cam",
        "data_path": "data/nuscenes/samples/CAM_FRONT/img0.jpg",
        "sensor2ego_rotation": [1, 0, 0, 0],
        "sensor2ego_translation": [0, 0, 0],
        "cam_intrinsic": np.array([[800.0, 0, 800], [0, 800.0, 450],
                                   [0, 0, 1]]),
    }
    info = {
        "token": "samp0",
        "ego2global_rotation": [1, 0, 0, 0],
        "ego2global_translation": [0, 0, 0],
        "cams": {cam: dict(cam_info) for cam in e2.CAM_TYPES},
    }
    pkl = tmp_path / "nuscenes_infos_val.pkl"
    with open(pkl, "wb") as f:
        pickle.dump({"infos": [info], "metadata": {"version": "fake"}}, f)

    coco = e2.export_2d_annotation(FakeNusc(), str(pkl))
    out = tmp_path / "nuscenes_infos_val_mono3d.coco.json"
    assert out.exists()
    loaded = json.loads(out.read_text())
    assert loaded == json.loads(json.dumps(coco))
    assert len(coco["images"]) == 6
    assert len(coco["annotations"]) == 6          # 1 visible ann × 6 cams
    assert {c["name"] for c in coco["categories"]} == set(
        __import__("transcar_tpu.core.config",
                   fromlist=["CLASS_NAMES"]).CLASS_NAMES)
    im = coco["images"][0]
    assert im["file_name"] == "samples/CAM_FRONT/img0.jpg"
    assert (im["width"], im["height"]) == (1600, 900)
    ann = coco["annotations"][0]
    assert ann["segmentation"] == [] and ann["id"] == 0
