"""Golden-parity regression harness (VERDICT round 1, item 2).

Runs the complete three-app pipeline — keyframe selection → TSDF fusion →
joint refinement — on a pinned synthetic dataset written to disk in the
reference's exact on-disk layout (``intrinsic3d_tpu/io/golden_dataset.py``),
then diffs every stage-boundary artifact the reference produces
(``apps/src/app_intrinsic3d.cpp:159-209``) against goldens committed under
``tests/goldens/sphere/``:

  - ``fusion/keyframes.txt``       — window header + per-frame score/flag
  - ``fusion/volume.tsdf``         — binary volume (format + numeric diff)
  - ``fusion/mesh.ply``            — fused mesh (chamfer distance)
  - ``intrinsic3d/mesh_g0_p0.ply`` — final refined mesh (chamfer + analytic error)
  - ``intrinsic3d/poses_g0_p0.txt``/``intrinsics_g0_p0.txt`` — final camera state

and asserts the refined mesh's geometric error against the analytic
ground-truth sphere under a fixed bound.

Dataset-path-driven: set ``I3D_GOLDEN_DATASET=/path/to/dataset`` (a folder
holding ``sensor.yml``/``keyframes.yml``/``fusion.yml``/``intrinsic3d.yml``,
e.g. a real Lion download with the reference's configs) to run the same
harness on it; golden diffs then read from ``$I3D_GOLDEN_DATASET/goldens/``
when present, and the analytic-sphere quality bound is skipped.

Regenerating goldens after an intentional numerical change:

    I3D_GOLDEN_REGEN=1 python -m pytest tests/test_golden.py -q -o addopts=

then review + commit the diff under tests/goldens/.
"""

import gzip
import os
import shutil

import numpy as np
import pytest

pytestmark = pytest.mark.e2e  # full-pipeline runs; fast lane: -m "not e2e"

from intrinsic3d_tpu.io.ply import load_ply
from intrinsic3d_tpu.io.tsdf_io import VOXEL_DTYPE, load_tsdf
from intrinsic3d_tpu.io.trajectory import load_poses
from intrinsic3d_tpu.mesh.metrics import chamfer_distance, mesh_error_vs_analytic

GOLDEN_DIR = os.path.join(os.path.dirname(__file__), "goldens", "sphere")
REGEN = os.environ.get("I3D_GOLDEN_REGEN", "") == "1"
DATASET_ENV = os.environ.get("I3D_GOLDEN_DATASET", "")

# Artifacts pinned as goldens (relative to the dataset root). Binary ones are
# stored gzipped; text ones verbatim.
PINNED = [
    "fusion/keyframes.txt",
    "fusion/volume.tsdf",
    "fusion/mesh.ply",
    "intrinsic3d/mesh_g0_p0.ply",
    "intrinsic3d/poses_g0_p0.txt",
    "intrinsic3d/intrinsics_g0_p0.txt",
]
_BINARY = (".tsdf", ".ply")


def _golden_path(golden_dir: str, rel: str) -> str:
    flat = rel.replace("/", "__")
    if rel.endswith(_BINARY):
        flat += ".gz"
    return os.path.join(golden_dir, flat)


def _read_golden(golden_dir: str, rel: str) -> bytes:
    path = _golden_path(golden_dir, rel)
    if not os.path.exists(path):
        pytest.skip(f"no golden for {rel} at {path}")
    if path.endswith(".gz"):
        with gzip.open(path, "rb") as f:
            return f.read()
    with open(path, "rb") as f:
        return f.read()


def _materialize_golden(golden_dir: str, rel: str, tmpdir: str) -> str:
    """Write the golden artifact bytes to a real file (for loaders that want
    a filename) and return its path."""
    data = _read_golden(golden_dir, rel)
    out = os.path.join(tmpdir, "golden__" + rel.replace("/", "__"))
    with open(out, "wb") as f:
        f.write(data)
    return out


@pytest.fixture(scope="module")
def pipeline(tmp_path_factory):
    """Run the three apps end to end; returns (root, synthetic, golden_dir)."""
    from intrinsic3d_tpu.apps import app_fusion, app_intrinsic3d, app_keyframes

    if DATASET_ENV:
        root = os.path.abspath(DATASET_ENV)
        synthetic = False
        golden_dir = os.path.join(root, "goldens")
    else:
        from intrinsic3d_tpu.io.golden_dataset import (
            GoldenSceneSpec,
            export_sphere_dataset,
        )

        root = str(tmp_path_factory.mktemp("golden_sphere"))
        export_sphere_dataset(root, GoldenSceneSpec())
        synthetic = True
        golden_dir = GOLDEN_DIR

    sensor_yml = os.path.join(root, "sensor.yml")
    cwd = os.getcwd()
    try:
        for app, cfg in [
            (app_keyframes, "keyframes.yml"),
            (app_fusion, "fusion.yml"),
            (app_intrinsic3d, "intrinsic3d.yml"),
        ]:
            assert app.main(["-s", sensor_yml, "-c", os.path.join(root, cfg)]) == 0
            os.chdir(cwd)
    finally:
        os.chdir(cwd)

    if REGEN:
        os.makedirs(golden_dir, exist_ok=True)
        for rel in PINNED:
            src = os.path.join(root, rel)
            dst = _golden_path(golden_dir, rel)
            if dst.endswith(".gz"):
                with open(src, "rb") as fi, gzip.GzipFile(dst, "wb", mtime=0) as fo:
                    shutil.copyfileobj(fi, fo)
            else:
                shutil.copyfile(src, dst)
    return root, synthetic, golden_dir


def test_all_artifacts_exist(pipeline):
    root, _, _ = pipeline
    for rel in PINNED:
        assert os.path.exists(os.path.join(root, rel)), rel


def test_keyframes_golden(pipeline):
    root, _, golden_dir = pipeline
    produced = open(os.path.join(root, "fusion/keyframes.txt")).read().splitlines()
    golden = _read_golden(golden_dir, "fusion/keyframes.txt").decode().splitlines()
    assert produced[0] == golden[0]  # window size header
    assert len(produced) == len(golden)
    for lp, lg in zip(produced[1:], golden[1:]):
        sp, fp = lp.split()
        sg, fg = lg.split()
        assert fp == fg  # selection flags byte-identical
        assert abs(float(sp) - float(sg)) < 1e-5  # Crete blur scores


def test_tsdf_format_and_golden(pipeline, tmp_path):
    root, _, golden_dir = pipeline
    path = os.path.join(root, "fusion/volume.tsdf")

    # -- format: reference-compatible header + 24-byte Voxel records
    #    (sparse_voxel_grid.cpp:483-569 layout)
    raw = open(path, "rb").read()
    n = int(np.frombuffer(raw[12:20], "<u8")[0])
    assert len(raw) == 24 + n * VOXEL_DTYPE.itemsize
    vol = load_tsdf(path)
    assert not vol.is_sbr and vol.num_voxels == n
    assert vol.truncation == pytest.approx(5.0 * vol.voxel_size)

    # -- numeric diff vs the committed golden volume
    gpath = _materialize_golden(golden_dir, "fusion/volume.tsdf", str(tmp_path))
    gold = load_tsdf(gpath)
    assert vol.voxel_size == pytest.approx(gold.voxel_size)
    key = lambda c: (c[:, 0].astype(np.int64) << 42) + (c[:, 1].astype(np.int64) << 21) + c[:, 2]
    ka, kg = key(vol.coords), key(gold.coords)
    oa, og = np.argsort(ka), np.argsort(kg)
    np.testing.assert_array_equal(ka[oa], kg[og])  # identical active-voxel set
    np.testing.assert_allclose(vol.sdf[oa], gold.sdf[og], atol=2e-4)
    np.testing.assert_allclose(vol.weight[oa], gold.weight[og], rtol=1e-3, atol=1e-2)
    assert np.mean(np.abs(vol.color[oa].astype(int) - gold.color[og].astype(int))) < 1.0


def test_fused_mesh_golden(pipeline, tmp_path):
    root, _, golden_dir = pipeline
    verts, faces, _ = load_ply(os.path.join(root, "fusion/mesh.ply"))
    assert len(verts) > 100 and len(faces) > 100
    gpath = _materialize_golden(golden_dir, "fusion/mesh.ply", str(tmp_path))
    gv, gf, _ = load_ply(gpath)
    vol = load_tsdf(os.path.join(root, "fusion/volume.tsdf"))
    ch = chamfer_distance(verts, faces, gv, gf, num_samples=20000)
    assert ch["symmetric_mean"] < 0.1 * vol.voxel_size


def assert_poses_sane(root: str, num_frames: int, bound_m: float) -> None:
    """Golden-time sanity: refined poses must stay within `bound_m` of the
    dataset's analytic orbit ground truth (ADVICE r4: a silent regen must
    not be able to pin a diverged pose solve — the round-3/4 goldens pinned
    a keyframe 1.1 m / 4.2 m off the orbit before the pose-observability
    gate, refine/device_assembly.py). Runs on every suite pass, with or
    without I3D_GOLDEN_REGEN."""
    poses, _ = load_poses(os.path.join(root, "intrinsic3d/poses_g0_p0.txt"))
    assert len(poses) == num_frames
    errs = []
    for i, T in enumerate(poses):
        gt = np.loadtxt(os.path.join(root, "rgbd", f"frame-{i:06d}.pose.txt"))
        errs.append(float(np.linalg.norm(T[:3, 3] - gt[:3, 3])))
    worst = max(errs)
    assert worst < bound_m, (
        f"refined pose diverged from the analytic orbit: max center error "
        f"{worst:.3f} m >= {bound_m} m (per-frame: {np.round(errs, 4)})"
    )


def test_refined_poses_within_orbit_bound(pipeline):
    root, synthetic, _ = pipeline
    if not synthetic:
        pytest.skip("analytic orbit ground truth only exists for the synthetic scene")
    from intrinsic3d_tpu.io.golden_dataset import GoldenSceneSpec

    # measured post-gate band: keyframes 0.035-0.103 m, non-keyframes exact
    assert_poses_sane(root, GoldenSceneSpec().num_frames, bound_m=0.2)


def test_refined_poses_and_intrinsics_golden(pipeline, tmp_path):
    root, _, golden_dir = pipeline
    poses, ts = load_poses(os.path.join(root, "intrinsic3d/poses_g0_p0.txt"))
    gpath = _materialize_golden(golden_dir, "intrinsic3d/poses_g0_p0.txt", str(tmp_path))
    gposes, gts = load_poses(gpath)
    assert len(poses) == len(gposes)
    for T, G in zip(poses, gposes):
        np.testing.assert_allclose(T[:3, 3], G[:3, 3], atol=5e-4)  # translation, m
        np.testing.assert_allclose(T[:3, :3], G[:3, :3], atol=2e-3)  # rotation

    from intrinsic3d_tpu.camera import load_intrinsics_matrix

    K = load_intrinsics_matrix(os.path.join(root, "intrinsic3d/intrinsics_g0_p0.txt"))
    gk = _materialize_golden(
        golden_dir, "intrinsic3d/intrinsics_g0_p0.txt", str(tmp_path)
    )
    np.testing.assert_allclose(K, load_intrinsics_matrix(gk), rtol=1e-4)


def test_refined_mesh_golden(pipeline, tmp_path):
    root, _, golden_dir = pipeline
    verts, faces, _ = load_ply(os.path.join(root, "intrinsic3d/mesh_g0_p0.ply"))
    assert len(verts) > 100
    gpath = _materialize_golden(golden_dir, "intrinsic3d/mesh_g0_p0.ply", str(tmp_path))
    gv, gf, _ = load_ply(gpath)
    vol = load_tsdf(os.path.join(root, "fusion/volume.tsdf"))
    final_voxel = vol.voxel_size * 0.5  # 2 grid levels -> x2 upsample once
    ch = chamfer_distance(verts, faces, gv, gf, num_samples=20000)
    assert ch["symmetric_mean"] < 0.2 * final_voxel


def test_refined_mesh_error_vs_analytic(pipeline):
    """The BASELINE north-star bound: refined mesh within a geometric-error
    bound of ground truth. Ground truth here is the analytic sphere the
    dataset renders; the bound is a fraction of the FUSED voxel size (the
    refined grid is 2x finer, so beating ~voxel/2 means refinement actually
    sharpened the fusion result). Documented in BENCH_NOTES.md."""
    root, synthetic, _ = pipeline
    if not synthetic:
        pytest.skip("analytic ground truth only exists for the synthetic scene")
    from intrinsic3d_tpu.io.golden_dataset import GoldenSceneSpec

    spec = GoldenSceneSpec()
    center = np.asarray(spec.center)

    verts, faces, _ = load_ply(os.path.join(root, "intrinsic3d/mesh_g0_p0.ply"))
    err = mesh_error_vs_analytic(
        verts, faces, lambda p: np.linalg.norm(p - center, axis=-1) - spec.radius,
        num_samples=20000,
    )
    fv, ff, _ = load_ply(os.path.join(root, "fusion/mesh.ply"))
    err_fused = mesh_error_vs_analytic(
        fv, ff, lambda p: np.linalg.norm(p - center, axis=-1) - spec.radius,
        num_samples=20000,
    )
    # Absolute bound: refined surface within half a fused voxel of ground
    # truth (measured 0.12x at the pinned spec — 0.61 mm at 10 mm voxels).
    # Relative guard: the fused mesh of this noise-free synthetic scene is
    # already sub-voxel-accurate (~0.28 mm), so refinement cannot be expected
    # to beat it — the guard catches refinement DAMAGING geometry instead.
    assert err["rms"] < 0.5 * spec.voxel_size
    assert err["rms"] < max(err_fused["rms"] * 3.0, 0.1 * spec.voxel_size)
