"""Devkit-free radar ingestion tests (data/radar_io.py).

The oracle here is an INDEPENDENT restatement of the devkit's
``RadarPointCloud.from_file`` / ``from_file_multisweep`` semantics
(the path the reference calls at detr3d_head.py:305-309): quaternions
go through scipy.spatial.transform.Rotation (not our quat_to_rot), the
frame chain is applied as explicit R@p+t compositions (not homogeneous
matrix products), and filtering/accumulation is restated from scratch —
so a shared bug between implementation and oracle is implausible.

Fixtures are real on-disk artifacts: binary .pcd sweep files + the five
nuScenes JSON tables, driving the FULL path (bytes on disk →
[num_tokens, 36] buffer) with zero devkit involvement.
"""
import json
import os

import numpy as np
import pytest
from scipy.spatial.transform import Rotation

from transcar_tpu.data import radar_io
from transcar_tpu.data.radar import (RADAR_CHANNELS, build_radar_tokens,
                                     load_radar_tokens)
from transcar_tpu.data.radar_io import (NuScenesTables, radar_multisweep,
                                        read_radar_pcd, remove_close,
                                        transform_matrix, write_radar_pcd)


def _rot(q_wxyz):
    """Independent quaternion→matrix (scipy uses xyzw order)."""
    w, x, y, z = q_wxyz
    return Rotation.from_quat([x, y, z, w]).as_matrix()


def _rand_quat(rng):
    q = rng.normal(size=4)
    return (q / np.linalg.norm(q)).tolist()


def _rand_points(rng, n, max_abs=45.0):
    """[18, n] radar points, all states passing the default filters,
    values exactly representable in the on-disk field dtypes."""
    pts = np.zeros((18, n), np.float64)
    pts[0:3] = rng.uniform(-max_abs, max_abs, (3, n)).astype(np.float32)
    pts[2] = rng.uniform(-3.0, 2.0, n).astype(np.float32)   # z in range
    pts[3] = rng.integers(0, 7, n)                          # dyn_prop ok
    pts[4] = rng.integers(0, 100, n)                        # id
    pts[5] = rng.uniform(-10, 30, n).astype(np.float32)     # rcs
    pts[6:10] = rng.uniform(-20, 20, (4, n)).astype(np.float32)
    pts[10] = 1                                             # quality
    pts[11] = 3                                             # ambig ok
    pts[12:14] = rng.integers(0, 5, (2, n))
    pts[14] = 0                                             # invalid ok
    pts[15] = rng.integers(0, 8, n)                         # pdh0
    pts[16:18] = rng.integers(0, 5, (2, n))
    return pts


# ---------------------------------------------------------------- PCD


def test_pcd_roundtrip(tmp_path):
    rng = np.random.default_rng(0)
    pts = _rand_points(rng, 57)
    path = str(tmp_path / "a.pcd")
    write_radar_pcd(path, pts)
    got = read_radar_pcd(path)
    np.testing.assert_array_equal(got, pts)


def test_pcd_state_filters_match_bruteforce_oracle(tmp_path):
    rng = np.random.default_rng(1)
    pts = _rand_points(rng, 400)
    # scatter every state through the full nuScenes value ranges
    pts[3] = rng.integers(0, 8, 400)     # dyn_prop 0..7 (7 filtered)
    pts[11] = rng.integers(0, 5, 400)    # ambig 0..4 (only 3 kept)
    pts[14] = rng.integers(0, 18, 400)   # invalid 0..17 (only 0 kept)
    path = str(tmp_path / "b.pcd")
    write_radar_pcd(path, pts)

    got = read_radar_pcd(path)
    keep = np.array([(p14 in (0,)) and (p3 in range(7)) and (p11 in (3,))
                     for p3, p11, p14 in zip(pts[3], pts[11], pts[14])])
    np.testing.assert_array_equal(got, pts[:, keep])

    # custom filter sets are honored too
    got = read_radar_pcd(path, invalid_states=(0, 4, 17),
                         dynprop_states=(0, 1), ambig_states=(2, 3))
    keep = (np.isin(pts[14], (0, 4, 17)) & np.isin(pts[3], (0, 1))
            & np.isin(pts[11], (2, 3)))
    np.testing.assert_array_equal(got, pts[:, keep])


def test_pcd_nan_first_point_is_empty_cloud(tmp_path):
    rng = np.random.default_rng(2)
    pts = _rand_points(rng, 5)
    pts[0, 0] = np.nan
    path = str(tmp_path / "c.pcd")
    write_radar_pcd(path, pts)
    got = read_radar_pcd(path)
    assert got.shape == (18, 0)


def test_pcd_rejects_non_binary_and_truncation(tmp_path):
    rng = np.random.default_rng(3)
    pts = _rand_points(rng, 4)
    path = str(tmp_path / "d.pcd")
    write_radar_pcd(path, pts)
    raw = open(path, "rb").read()
    trunc = str(tmp_path / "t.pcd")
    with open(trunc, "wb") as f:
        f.write(raw[:-8])
    with pytest.raises(AssertionError):
        read_radar_pcd(trunc)
    with pytest.raises(AssertionError):
        read_radar_pcd(str(tmp_path / "nope.bin"))


# --------------------------------------------------- geometry helpers


def test_transform_matrix_vs_scipy_oracle():
    rng = np.random.default_rng(4)
    for _ in range(20):
        q = _rand_quat(rng)
        t = rng.normal(size=3) * 10
        tm = transform_matrix(t, q)
        R = _rot(q)
        p = rng.normal(size=(3, 7))
        want = R @ p + t[:, None]
        got = (tm @ np.vstack([p, np.ones((1, 7))]))[:3]
        np.testing.assert_allclose(got, want, atol=1e-12)
        inv = transform_matrix(t, q, inverse=True)
        np.testing.assert_allclose(inv @ tm, np.eye(4), atol=1e-12)


def test_remove_close_is_xy_box_not_disk():
    pts = np.zeros((18, 4))
    pts[0] = [0.5, 0.5, 5.0, 0.5]
    pts[1] = [0.5, 5.0, 0.5, -0.9]
    out = remove_close(pts, 1.0)
    # only points with BOTH |x|<1 and |y|<1 drop (devkit logical_and)
    np.testing.assert_array_equal(out[0], [0.5, 5.0])
    np.testing.assert_array_equal(out[1], [5.0, 0.5])


# ------------------------------------------- synthetic mini nuScenes


def _build_mini_nuscenes(root, rng, version="v1.0-mini", nsweep_chain=3):
    """Write a one-sample nuScenes dataroot: 5 radar channels + LIDAR_TOP,
    each radar with a prev-chain of sweeps, real binary .pcd files, and
    the five JSON tables.  Returns the python-side record of everything
    written (for the independent oracle)."""
    os.makedirs(os.path.join(root, version), exist_ok=True)
    os.makedirs(os.path.join(root, "sweeps"), exist_ok=True)

    sensors, css, poses, sds = [], [], [], []
    raw_points = {}
    t0 = 1_531_883_530_000_000   # µs, realistic magnitude

    sample = {"token": "samp0", "timestamp": t0, "data": None}
    channels = ("LIDAR_TOP",) + RADAR_CHANNELS
    sample_data_map = {}
    for ci, chan in enumerate(channels):
        sensors.append({"token": f"sen_{chan}", "channel": chan,
                        "modality": "lidar" if chan == "LIDAR_TOP"
                        else "radar"})
        css.append({"token": f"cs_{chan}",
                    "sensor_token": f"sen_{chan}",
                    "translation": (rng.normal(size=3) * 2).tolist(),
                    "rotation": _rand_quat(rng)})
        # chain length: channel 1 gets a single sweep (prev="" break),
        # channel 2 gets a chain LONGER than nsweeps (cap check)
        if chan == "LIDAR_TOP":
            n_chain = 1
        elif ci == 1:
            n_chain = 1
        elif ci == 2:
            n_chain = nsweep_chain + 3
        else:
            n_chain = nsweep_chain
        toks = [f"sd_{chan}_{k}" for k in range(n_chain)]
        for k, tok in enumerate(toks):
            ts = t0 - k * 55_000 + ci * 7_000   # desynced vs LIDAR_TOP
            poses.append({"token": f"pose_{tok}",
                          "timestamp": ts,
                          "translation": (rng.normal(size=3) * 5).tolist(),
                          "rotation": _rand_quat(rng)})
            fname = f"sweeps/{tok}.pcd"
            sd = {"token": tok, "sample_token": "samp0",
                  "ego_pose_token": f"pose_{tok}",
                  "calibrated_sensor_token": f"cs_{chan}",
                  "filename": fname, "timestamp": ts,
                  "is_key_frame": k == 0,
                  "prev": toks[k + 1] if k + 1 < n_chain else "",
                  "next": toks[k - 1] if k > 0 else ""}
            sds.append(sd)
            if chan != "LIDAR_TOP":
                n = int(rng.integers(8, 25))
                pts = _rand_points(rng, n)
                # mix in filtered states, sensor-close points, and (for
                # channel 3's key sweep) an empty NaN cloud
                pts[14, ::5] = 7                        # invalid
                pts[3, 1::7] = 7                        # dyn_prop filtered
                pts[11, 2::6] = 2                       # ambig filtered
                pts[0:2, 3::8] = 0.25                   # sensor-close
                if ci == 3 and k == 0:
                    pts = _rand_points(rng, 1)
                    pts[0, 0] = np.nan
                write_radar_pcd(os.path.join(root, fname), pts)
                raw_points[tok] = pts
        sample_data_map[chan] = toks[0]
    sample["data"] = sample_data_map   # oracle-side convenience only

    with open(os.path.join(root, version, "sensor.json"), "w") as f:
        json.dump(sensors, f)
    with open(os.path.join(root, version, "calibrated_sensor.json"),
              "w") as f:
        json.dump(css, f)
    with open(os.path.join(root, version, "ego_pose.json"), "w") as f:
        json.dump(poses, f)
    with open(os.path.join(root, version, "sample_data.json"), "w") as f:
        json.dump(sds, f)
    with open(os.path.join(root, version, "sample.json"), "w") as f:
        json.dump([{"token": "samp0", "timestamp": t0,
                    "scene_token": "scene0", "prev": "", "next": ""}], f)

    return {"sample": sample,
            "sample_data": {d["token"]: d for d in sds},
            "ego_pose": {p["token"]: p for p in poses},
            "calibrated_sensor": {c["token"]: c for c in css},
            "raw_points": raw_points}


def _oracle_multisweep(ds, chan, nsweeps, min_distance=1.0):
    """Independent restatement of from_file_multisweep: scipy rotations,
    explicit R@p+t chain, starting from the raw arrays the fixture wrote."""
    sample = ds["sample"]
    ref_sd = ds["sample_data"][sample["data"]["LIDAR_TOP"]]
    ref_pose = ds["ego_pose"][ref_sd["ego_pose_token"]]
    ref_cs = ds["calibrated_sensor"][ref_sd["calibrated_sensor_token"]]
    R_rp = _rot(ref_pose["rotation"])
    t_rp = np.asarray(ref_pose["translation"])
    R_rc = _rot(ref_cs["rotation"])
    t_rc = np.asarray(ref_cs["translation"])
    ref_time = 1e-6 * ref_sd["timestamp"]

    out_p, out_t = [np.zeros((18, 0))], [np.zeros((1, 0))]
    sd = ds["sample_data"][sample["data"][chan]]
    for _ in range(nsweeps):
        raw = ds["raw_points"][sd["token"]].copy()
        if np.any(np.isnan(raw[:, 0])):
            raw = raw[:, :0]
        else:
            raw = raw[:, np.isin(raw[14], (0,))]
            raw = raw[:, np.isin(raw[3], tuple(range(7)))]
            raw = raw[:, np.isin(raw[11], (3,))]
        close = ((np.abs(raw[0]) < min_distance)
                 & (np.abs(raw[1]) < min_distance))
        raw = raw[:, ~close]

        pose = ds["ego_pose"][sd["ego_pose_token"]]
        cs = ds["calibrated_sensor"][sd["calibrated_sensor_token"]]
        p = raw[:3]
        p = _rot(cs["rotation"]) @ p + np.asarray(
            cs["translation"])[:, None]                       # → ego(t)
        p = _rot(pose["rotation"]) @ p + np.asarray(
            pose["translation"])[:, None]                     # → global
        p = R_rp.T @ (p - t_rp[:, None])                      # → ego(ref)
        p = R_rc.T @ (p - t_rc[:, None])                      # → ref sensor
        raw[:3] = p
        out_p.append(raw)
        lag = ref_time - 1e-6 * sd["timestamp"]
        out_t.append(np.full((1, raw.shape[1]), lag))
        if sd["prev"] == "":
            break
        sd = ds["sample_data"][sd["prev"]]
    return np.concatenate(out_p, axis=1), np.concatenate(out_t, axis=1)


@pytest.fixture(scope="module")
def mini_nusc(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("nusc"))
    ds = _build_mini_nuscenes(root, np.random.default_rng(42))
    return root, ds


def test_multisweep_matches_independent_oracle(mini_nusc):
    root, ds = mini_nusc
    nusc = NuScenesTables(root, version="v1.0-mini")
    sample = nusc.get("sample", "samp0")
    for nsweeps in (1, 3, 5):
        for chan in RADAR_CHANNELS:
            got_p, got_t = radar_multisweep(nusc, sample, chan,
                                            nsweeps=nsweeps)
            want_p, want_t = _oracle_multisweep(ds, chan, nsweeps)
            assert got_p.shape == want_p.shape, (chan, nsweeps)
            np.testing.assert_allclose(got_p, want_p, atol=1e-9)
            np.testing.assert_allclose(got_t, want_t, atol=1e-12)


def test_multisweep_exercises_all_edge_cases(mini_nusc):
    """The fixture must actually cover: early prev-chain break, chains
    longer than nsweeps, an empty NaN sweep, and filtered points."""
    root, ds = mini_nusc
    nusc = NuScenesTables(root, version="v1.0-mini")
    sample = nusc.get("sample", "samp0")
    # channel index 1 (RADAR_CHANNELS[0]) has a single sweep
    p1, t1 = radar_multisweep(nusc, sample, RADAR_CHANNELS[0], nsweeps=5)
    assert np.unique(t1).size == 1
    # channel index 2 has a 6-deep chain: nsweeps=3 must cap at 3 lags
    p2, t2 = radar_multisweep(nusc, sample, RADAR_CHANNELS[1], nsweeps=3)
    assert np.unique(t2).size == 3
    # channel index 3's key sweep is the NaN empty cloud → its lag absent
    p3, t3 = radar_multisweep(nusc, sample, RADAR_CHANNELS[2], nsweeps=5)
    sd_key = ds["sample_data"][sample["data"][RADAR_CHANNELS[2]]]
    key_lag = 1e-6 * (ds["sample_data"][sample["data"]["LIDAR_TOP"]]
                      ["timestamp"] - sd_key["timestamp"])
    assert not np.any(np.isclose(t3, key_lag))
    assert p3.shape[1] > 0          # prev sweeps still contribute
    # filters dropped something somewhere
    raw_total = sum(v.shape[1] for v in ds["raw_points"].values())
    kept = sum(radar_multisweep(nusc, sample, c, nsweeps=10)[0].shape[1]
               for c in RADAR_CHANNELS)
    assert 0 < kept < raw_total


def test_nuscenes_tables_index(mini_nusc):
    root, ds = mini_nusc
    nusc = NuScenesTables(root, version="v1.0-mini")
    assert nusc.tokens("sample") == ["samp0"]
    s = nusc.get("sample", "samp0")
    # derived key-frame map covers every channel, key frames only
    for chan in ("LIDAR_TOP",) + RADAR_CHANNELS:
        tok = s["data"][chan]
        sd = nusc.get("sample_data", tok)
        assert sd["is_key_frame"]
        assert sd["channel"] == chan
    cs = nusc.get("calibrated_sensor", "cs_RADAR_FRONT")
    assert cs["sensor_token"] == "sen_RADAR_FRONT"
    with pytest.raises(KeyError):
        nusc.get("sample", "missing")


def test_load_radar_tokens_end_to_end(mini_nusc):
    """Bytes on disk → the exact [num_tokens, 36] buffer, vs the
    independent-oracle ingestion feeding the (separately oracle-tested)
    featurizer.  No devkit anywhere (VERDICT r3 item 1)."""
    root, ds = mini_nusc
    nusc = NuScenesTables(root, version="v1.0-mini")
    got = load_radar_tokens(nusc, "samp0", nsweeps=3, num_tokens=200)
    assert got.shape == (200, 36) and got.dtype == np.float32

    per, rots = {}, {}
    for ch in RADAR_CHANNELS:
        per[ch] = _oracle_multisweep(ds, ch, 3)
        cs = ds["calibrated_sensor"][f"cs_{ch}"]
        rots[ch] = _rot(cs["rotation"])
    ref_cs = ds["calibrated_sensor"]["cs_LIDAR_TOP"]
    want = build_radar_tokens(per, rots, _rot(ref_cs["rotation"]),
                              num_tokens=200)
    np.testing.assert_allclose(got, want, atol=1e-4)

    n_real = int((got[:, 0] != 500.0).sum())
    assert 0 < n_real < 200           # real tokens AND sentinel tail
    np.testing.assert_array_equal(got[n_real:], 500.0)


def test_tables_interchangeable_with_devkit_like_object(mini_nusc):
    """load_radar_tokens accepts either NuScenesTables or a devkit-style
    object (get + dataroot) — identical buffers."""
    root, ds = mini_nusc

    class FakeDevkit:
        dataroot = root

        def get(self, table, token):
            if table == "sample":
                return ds["sample"]
            return ds[table][token]

    a = load_radar_tokens(NuScenesTables(root, version="v1.0-mini"),
                          "samp0", nsweeps=3, num_tokens=150)
    b = load_radar_tokens(FakeDevkit(), "samp0", nsweeps=3, num_tokens=150)
    np.testing.assert_array_equal(a, b)


def test_cache_radar_tokens_cli(mini_nusc):
    root, _ = mini_nusc
    from transcar_tpu.cli.create_data import cache_radar_tokens
    cache_dir = cache_radar_tokens(root, "v1.0-mini", nsweeps=3,
                                   num_tokens=150)
    path = os.path.join(cache_dir, "samp0.npy")
    assert os.path.exists(path)
    nusc = NuScenesTables(root, version="v1.0-mini")
    want = load_radar_tokens(nusc, "samp0", nsweeps=3, num_tokens=150)
    np.testing.assert_array_equal(np.load(path), want)


def test_train_radar_fn_serves_real_tokens(mini_nusc):
    """cli/train.py's provider must ingest the synthetic dataroot
    devkit-free (real tokens, not the sentinel fallback) and hit its
    cache on the second call."""
    root, _ = mini_nusc
    from transcar_tpu.cli.train import _try_radar_fn
    from transcar_tpu.core.config import get_preset
    cfg = get_preset("transcar_r101", {"data.data_root": root,
                                       "data.version": "v1.0-mini"})
    fn = _try_radar_fn(cfg)
    toks = fn("samp0")
    assert toks.shape == (cfg.model.head.num_radar_tokens, 36)
    assert np.any(toks[:, 0] != 500.0), "sentinel fallback was used"
    np.testing.assert_array_equal(fn("samp0"), toks)
    # a token absent from the tables degrades to the sentinel buffer
    # per-sample instead of crashing the training loop
    bad = fn("not_a_real_token")
    np.testing.assert_array_equal(bad, 500.0)
