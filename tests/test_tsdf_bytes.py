"""Load-path byte-compatibility against hand-constructed reference records.

The `.tsdf` round-trip tests elsewhere validate the repo's writer against its
own reader — a symmetric bug (both sides wrong the same way) would pass them.
Here the records are packed as LITERAL bytes with the reference's exact C
struct layouts (``libintrinsic3d/include/nv/sparse_voxel_grid.h:56-77``,
``src/sparse_voxel_grid.cpp:483-569``): x86-64 padding, the 1-byte tail pad
after the u8[3] color, and the 8-aligned doubles of VoxelSBR.
"""

import struct

import numpy as np

from intrinsic3d_tpu.io.tsdf_io import load_tsdf


def _header(voxel_size, truncation, weight_sample, n):
    # f32 voxel_size, f32 truncation, f32 integration_weight_sample,
    # u64 num_voxels, f32 max_load_factor (sparse_voxel_grid.cpp:487-497)
    return struct.pack("<3f", voxel_size, truncation, weight_sample) + struct.pack(
        "<Qf", n, 0.6
    )


def test_load_plain_voxel_records(tmp_path):
    # Voxel: f32 sdf, f32 weight, u8 color[3], 1 pad byte → 12-byte struct;
    # record = int32[3] coords + struct = 24 bytes
    recs = [
        ((-3, 7, 12), 0.0125, 4.5, (10, 200, 31)),
        ((0, 0, 0), -0.004, 1.0, (255, 0, 128)),
        ((100, -200, 5), 0.02, 0.0, (1, 2, 3)),
    ]
    payload = b"".join(
        struct.pack("<3iff3Bx", *c, sdf, w, *col) for c, sdf, w, col in recs
    )
    assert len(payload) == 24 * len(recs)
    p = tmp_path / "plain.tsdf"
    p.write_bytes(_header(0.004, 0.02, 1.0, len(recs)) + payload)

    vol = load_tsdf(str(p))
    assert not vol.is_sbr
    assert vol.num_voxels == 3
    assert vol.voxel_size == np.float32(0.004)
    assert vol.truncation == np.float32(0.02)
    np.testing.assert_array_equal(vol.coords, [r[0] for r in recs])
    np.testing.assert_array_equal(vol.sdf, np.asarray([r[1] for r in recs], np.float32))
    np.testing.assert_array_equal(
        vol.weight, np.asarray([r[2] for r in recs], np.float32)
    )
    np.testing.assert_array_equal(vol.color, [r[3] for r in recs])


def test_load_sbr_voxel_records(tmp_path):
    # VoxelSBR (32-byte struct): f64 sdf @0, f32 weight @8, u8 color[3] @12,
    # 1 pad @15, f64 albedo @16, f64 sdf_refined @24 — doubles 8-aligned
    # WITHIN the struct; absolute record offsets 12/20/24/28/36, 44 B total
    recs = [
        ((5, -1, 9), 0.00625, 3.0, (9, 8, 7), 0.6, 0.0061),
        ((-50, 33, 2), -0.0199, 12.0, (100, 101, 102), 0.42, -0.02),
    ]
    payload = b"".join(
        struct.pack("<3idf3Bxdd", *c, sdf, w, *col, alb, sdfr)
        for c, sdf, w, col, alb, sdfr in recs
    )
    assert len(payload) == 44 * len(recs)
    p = tmp_path / "sbr.tsdf"
    p.write_bytes(_header(0.002, 0.01, 2.0, len(recs)) + payload)

    vol = load_tsdf(str(p))
    assert vol.is_sbr
    assert vol.num_voxels == 2
    np.testing.assert_array_equal(vol.coords, [r[0] for r in recs])
    np.testing.assert_array_equal(vol.sdf, np.asarray([r[1] for r in recs], np.float64))
    np.testing.assert_array_equal(
        vol.weight, np.asarray([r[2] for r in recs], np.float32)
    )
    np.testing.assert_array_equal(vol.color, [r[3] for r in recs])
    np.testing.assert_array_equal(
        vol.albedo, np.asarray([r[4] for r in recs], np.float64)
    )
    np.testing.assert_array_equal(
        vol.sdf_refined, np.asarray([r[5] for r in recs], np.float64)
    )


def test_load_sbr_explicit_flag_beats_inference(tmp_path):
    # one SBR record whose payload size (44) is NOT a multiple of the plain
    # record size — inference works; the explicit flag must agree
    c, sdf, w, col, alb, sdfr = (1, 2, 3), 0.005, 1.0, (4, 5, 6), 0.55, 0.004
    payload = struct.pack("<3idf3Bxdd", *c, sdf, w, *col, alb, sdfr)
    p = tmp_path / "one.tsdf"
    p.write_bytes(_header(0.004, 0.02, 1.0, 1) + payload)
    vol_auto = load_tsdf(str(p))
    vol_flag = load_tsdf(str(p), sbr=True)
    assert vol_auto.is_sbr and vol_flag.is_sbr
    assert float(vol_auto.albedo[0]) == float(vol_flag.albedo[0]) == 0.55
