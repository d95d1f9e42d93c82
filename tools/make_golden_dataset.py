"""Generate (and optionally run + pin) a synthetic golden dataset.

Writes an analytic orbit-capture scene to disk in the reference's exact
on-disk layout (``intrinsic3d_tpu/io/golden_dataset.py`` — what
``nv::SensorI3d``, ``sensor_i3d.cpp:184-220``, consumes), optionally drives
the three CLI apps on it, and optionally pins the stage-boundary artifacts
(``apps/src/app_intrinsic3d.cpp:159-209``) as goldens for the regression
harness (tests/test_golden*.py).

Specs:
  default — the toy pin (160x120 x 12 frames x 2 grid levels);
            goldens live in tests/goldens/sphere/
  mid     — the CPU-suite mid-scale pin (320x240 x 20 frames x 3 grid
            levels, frame bucketing forced); tests/goldens/sphere_mid/
  full    — the realistic-scale TPU variant (640x480 x 30 frames x 3 grid
            levels, production solver budget); run on the chip, error
            numbers recorded in BENCH_NOTES.md (too large to pin in-repo)

Usage:
  python tools/make_golden_dataset.py --spec mid --out /tmp/golden_mid
  python tools/make_golden_dataset.py --spec mid --run --regen-goldens
  python tools/make_golden_dataset.py --spec full --run --tpu
"""

from __future__ import annotations

import argparse
import gzip
import os
import shutil
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
_GOLDEN_DIRS = {
    "default": os.path.join(_REPO, "tests", "goldens", "sphere"),
    "mid": os.path.join(_REPO, "tests", "goldens", "sphere_mid"),
    "full": None,  # TPU-run variant; not pinned in-repo
}


def pinned_artifacts(grid_levels: int) -> list:
    """Stage-boundary artifacts to pin, per schedule depth: the fusion
    outputs plus the FINAL refined state and one mid-schedule mesh (catches
    multi-level regressions that cancel by the last level)."""
    pins = [
        "fusion/keyframes.txt",
        "fusion/volume.tsdf",
        "fusion/mesh.ply",
        "intrinsic3d/mesh_g0_p0.ply",
        "intrinsic3d/poses_g0_p0.txt",
        "intrinsic3d/intrinsics_g0_p0.txt",
    ]
    if grid_levels >= 3:
        pins.insert(3, "intrinsic3d/mesh_g1_p0.ply")
    return pins


def golden_path(golden_dir: str, rel: str) -> str:
    flat = rel.replace("/", "__")
    if rel.endswith((".tsdf", ".ply")):
        flat += ".gz"
    return os.path.join(golden_dir, flat)


def pin_artifacts(root: str, golden_dir: str, pins: list) -> None:
    os.makedirs(golden_dir, exist_ok=True)
    for rel in pins:
        src = os.path.join(root, rel)
        dst = golden_path(golden_dir, rel)
        if dst.endswith(".gz"):
            with open(src, "rb") as fi, gzip.GzipFile(dst, "wb", mtime=0) as fo:
                shutil.copyfileobj(fi, fo)
        else:
            shutil.copyfile(src, dst)
        print(f"pinned {rel} -> {dst}")


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--spec", choices=("default", "mid", "full"), default="mid")
    ap.add_argument("--out", default="", help="dataset folder (default: temp dir)")
    ap.add_argument("--run", action="store_true", help="drive the three apps on it")
    ap.add_argument(
        "--regen-goldens",
        action="store_true",
        help="pin the produced artifacts under tests/goldens/ (implies --run)",
    )
    ap.add_argument(
        "--tpu",
        action="store_true",
        help="leave the TPU backend active (default: force CPU for determinism)",
    )
    args = ap.parse_args(argv)

    import jax

    if not args.tpu:
        jax.config.update("jax_platforms", "cpu")
    else:
        jax.config.update("jax_compilation_cache_dir", ".jax_cache")

    from intrinsic3d_tpu.io.golden_dataset import GoldenSceneSpec, export_sphere_dataset

    spec = {
        "default": GoldenSceneSpec(),
        "mid": GoldenSceneSpec.mid_scale(),
        "full": GoldenSceneSpec.full_scale(),
    }[args.spec]

    root = os.path.abspath(args.out) if args.out else tempfile.mkdtemp(prefix=f"golden_{args.spec}_")
    sensor_yml = export_sphere_dataset(root, spec)
    print(f"dataset ({args.spec}): {root}")

    if args.run or args.regen_goldens:
        import logging

        logging.basicConfig(level=logging.INFO, format="%(message)s")
        from intrinsic3d_tpu.apps import app_fusion, app_intrinsic3d, app_keyframes

        cwd = os.getcwd()
        try:
            for app, cfg in [
                (app_keyframes, "keyframes.yml"),
                (app_fusion, "fusion.yml"),
                (app_intrinsic3d, "intrinsic3d.yml"),
            ]:
                rc = app.main(["-s", sensor_yml, "-c", os.path.join(root, cfg)])
                os.chdir(cwd)
                if rc != 0:
                    print(f"app failed: {cfg} (rc {rc})", file=sys.stderr)
                    return rc
        finally:
            os.chdir(cwd)

    if args.regen_goldens:
        gd = _GOLDEN_DIRS[args.spec]
        if gd is None:
            print("the full-scale spec is not pinned in-repo (record numbers in BENCH_NOTES.md)")
            return 1
        pin_artifacts(root, gd, pinned_artifacts(spec.grid_levels))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
