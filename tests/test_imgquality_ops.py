"""Image-quality descriptor operators: blockiness, grad_orient.
Hand-built pattern tests on the raw kernels plus a brute numpy twin of
the whole corpus pass (the test_pixel_ops pattern).
"""

import numpy as np
import pyarrow as pa

from osmquadtreepostgis_ray import queries as Q
from osmquadtreepostgis_ray.stages.images import (
    BLOCKY_SCORE_MILLI, blockiness_stats, grad_orient_stats)


def _batch_of(pixels: np.ndarray) -> pa.Table:
    h, w = pixels.shape
    return pa.table({
        "image_id": pa.array(["t0"]),
        "bytes": pa.array([pixels.astype(np.uint8).tobytes()], pa.binary()),
        "w": pa.array([w], pa.int32()),
        "h": pa.array([h], pa.int32()),
        "fmt": pa.array(["raw"]),
    })


def test_blockiness_flags_block_quantized_image():
    # smooth horizontal ramp: every neighbor diff is 1 -> score 0
    ramp = np.tile(np.arange(16, dtype=np.uint8), (16, 1))
    smooth = blockiness_stats(_batch_of(ramp)).to_pandas().iloc[0]
    assert smooth["score_milli"] == 0
    assert not smooth["is_blocky"]
    # 8x8 block-constant image: interior diffs 0, boundary diffs 80
    blk = np.kron(np.arange(4, dtype=np.uint8).reshape(2, 2) * 80,
                  np.ones((8, 8), np.uint8))
    blocky = blockiness_stats(_batch_of(blk)).to_pandas().iloc[0]
    assert blocky["i_sum"] == 0
    assert blocky["score_milli"] >= BLOCKY_SCORE_MILLI
    assert blocky["is_blocky"]


def test_blockiness_counts_are_exhaustive():
    rng = np.random.default_rng(7)
    img = rng.integers(0, 256, size=(16, 32), dtype=np.uint8)
    row = blockiness_stats(_batch_of(img)).to_pandas().iloc[0]
    h, w = img.shape
    assert row["b_cnt"] + row["i_cnt"] == h * (w - 1) + w * (h - 1)
    a = img.astype(np.int64)
    total = (np.abs(np.diff(a, axis=1)).sum()
             + np.abs(np.diff(a, axis=0)).sum())
    assert row["b_sum"] + row["i_sum"] == total


def test_grad_orient_known_ramps():
    # horizontal ramp: gx = 2 > 0, gy = 0 -> code 1 + 4 = 5 everywhere
    ramp = np.tile(np.arange(16, dtype=np.uint8), (16, 1))
    r = grad_orient_stats(_batch_of(ramp)).to_pandas().iloc[0]
    assert r["o5"] == 14 * 14 and r["n_int"] == 14 * 14
    assert r[["o0", "o1", "o2", "o3", "o4", "o6", "o7", "flat"]].sum() == 0
    # constant image: all flat
    c = grad_orient_stats(_batch_of(np.full((16, 16), 9, np.uint8))) \
        .to_pandas().iloc[0]
    assert c["flat"] == 14 * 14
    # vertical ramp: gx = 0, gy = 2 -> code 2 (|gx| < |gy|)
    v = grad_orient_stats(_batch_of(
        np.tile(np.arange(16, dtype=np.uint8)[:, None], (1, 16)))) \
        .to_pandas().iloc[0]
    assert v["o2"] == 14 * 14


def test_grad_orient_bins_partition_interior(sf_dir):
    out = Q.q_grad_orient(sf_dir).to_pandas()
    bins = out[[f"o{b}" for b in range(8)] + ["flat"]].sum(axis=1)
    assert (bins == out["n_int"]).all()
    assert (out["n_int"] > 0).all()
