"""Ops tests: resize/pooling/pixel-shuffle against torch (CPU) ground truth."""

import numpy as np
import pytest
import torch
import torch.nn.functional as F

import jax.numpy as jnp

from segtpu import ops


def _nhwc(t):
    return np.transpose(t, (0, 2, 3, 1))


@pytest.mark.parametrize("align_corners", [True, False])
@pytest.mark.parametrize("shape,out", [((2, 3, 17, 23), (34, 46)), ((1, 5, 8, 8), (3, 5))])
def test_resize_bilinear_matches_torch(rng, align_corners, shape, out):
    x = rng.standard_normal(shape).astype(np.float32)
    ref = F.interpolate(torch.from_numpy(x), size=out, mode="bilinear",
                        align_corners=align_corners).numpy()
    got = np.asarray(ops.resize_bilinear(jnp.asarray(_nhwc(x)), out, align_corners))
    np.testing.assert_allclose(got, _nhwc(ref), rtol=1e-5, atol=1e-5)


def test_resize_nearest_matches_torch(rng):
    x = rng.standard_normal((2, 4, 9, 13)).astype(np.float32)
    ref = F.interpolate(torch.from_numpy(x), size=(18, 26), mode="nearest").numpy()
    got = np.asarray(ops.resize_nearest(jnp.asarray(_nhwc(x)), (18, 26)))
    np.testing.assert_allclose(got, _nhwc(ref))


@pytest.mark.parametrize("k,s,p", [(2, 2, 0), (3, 2, 1), (3, 1, 1)])
def test_max_pool_matches_torch(rng, k, s, p):
    x = rng.standard_normal((2, 6, 16, 16)).astype(np.float32)
    ref = F.max_pool2d(torch.from_numpy(x), k, s, p).numpy()
    got = np.asarray(ops.max_pool(jnp.asarray(_nhwc(x)), k, s, p))
    np.testing.assert_allclose(got, _nhwc(ref), rtol=1e-6)


def test_max_pool_ceil_mode(rng):
    x = rng.standard_normal((1, 3, 15, 15)).astype(np.float32)
    ref = F.max_pool2d(torch.from_numpy(x), 2, 2, 0, ceil_mode=True).numpy()
    got = np.asarray(ops.max_pool(jnp.asarray(_nhwc(x)), 2, 2, 0, ceil_mode=True))
    np.testing.assert_allclose(got, _nhwc(ref))


@pytest.mark.parametrize("out_size", [1, 2, 3, 6, 5])
def test_adaptive_avg_pool_matches_torch(rng, out_size):
    x = rng.standard_normal((2, 4, 19, 23)).astype(np.float32)
    ref = F.adaptive_avg_pool2d(torch.from_numpy(x), out_size).numpy()
    got = np.asarray(ops.adaptive_avg_pool(jnp.asarray(_nhwc(x)), out_size))
    np.testing.assert_allclose(got, _nhwc(ref), rtol=1e-5, atol=1e-6)


def test_adaptive_avg_pool_multi_matches_single(rng):
    """The fused read-once PSP pooling equals per-branch pooling exactly."""
    x = jnp.asarray(rng.standard_normal((2, 19, 23, 5)).astype(np.float32))
    sizes = (1, 2, 3, 6)
    multi = ops.pooling.adaptive_avg_pool_multi(x, sizes)
    for s, got in zip(sizes, multi):
        want = ops.adaptive_avg_pool(x, s)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=1e-6, atol=1e-6)


def test_avg_pool_matches_torch(rng):
    x = rng.standard_normal((2, 3, 16, 16)).astype(np.float32)
    ref = F.avg_pool2d(torch.from_numpy(x), 2, 2).numpy()
    got = np.asarray(ops.avg_pool(jnp.asarray(_nhwc(x)), 2, 2))
    np.testing.assert_allclose(got, _nhwc(ref), rtol=1e-5, atol=1e-7)


def test_max_pool_argmax_unpool_roundtrip(rng):
    """pool -> unpool must place the pooled value at the true argmax position
    (torch max_pool2d(return_indices) + max_unpool2d semantics for k2s2)."""
    x = rng.standard_normal((2, 1, 8, 8)).astype(np.float32)
    tx = torch.from_numpy(x)
    ref_pooled, ref_idx = F.max_pool2d(tx, 2, 2, return_indices=True)
    ref_unpooled = F.max_unpool2d(ref_pooled, ref_idx, 2, 2).numpy()

    pooled, idx = ops.max_pool_argmax(jnp.asarray(_nhwc(x)))
    np.testing.assert_allclose(np.asarray(pooled), _nhwc(ref_pooled.numpy()))
    unpooled = ops.max_unpool(pooled, idx)
    np.testing.assert_allclose(np.asarray(unpooled), _nhwc(ref_unpooled))


def test_max_unpool_with_decoder_values(rng):
    """SegNet uses encoder indices to unpool DIFFERENT decoder tensors."""
    x = rng.standard_normal((1, 1, 4, 4)).astype(np.float32)
    y = rng.standard_normal((1, 1, 2, 2)).astype(np.float32)
    tx, ty = torch.from_numpy(x), torch.from_numpy(y)
    _, ref_idx = F.max_pool2d(tx, 2, 2, return_indices=True)
    ref = F.max_unpool2d(ty, ref_idx, 2, 2).numpy()

    _, idx = ops.max_pool_argmax(jnp.asarray(_nhwc(x)))
    got = np.asarray(ops.max_unpool(jnp.asarray(_nhwc(y)), idx))
    np.testing.assert_allclose(got, _nhwc(ref))


def test_pixel_shuffle_matches_torch(rng):
    x = rng.standard_normal((2, 12, 5, 7)).astype(np.float32)
    ref = F.pixel_shuffle(torch.from_numpy(x), 2).numpy()
    got = np.asarray(ops.pixel_shuffle(jnp.asarray(_nhwc(x)), 2))
    np.testing.assert_allclose(got, _nhwc(ref))


@pytest.mark.parametrize("hw", [(25, 25), (16, 20)])
def test_max_pool_argmax_flat_matches_torch(rng, hw):
    """Overlapping 3x3/s2/p1 pool with FLAT return_indices — SegResNet's
    stem pool (reference models/segnet.py:209). torch ties resolve to the
    first position in row-major scan order; so must ours."""
    from segtpu.ops.pooling import max_pool_argmax_flat

    x = rng.standard_normal((2, 5, *hw)).astype(np.float32)
    ref_pooled, ref_idx = F.max_pool2d(torch.from_numpy(x), 3, 2, 1,
                                       return_indices=True)
    pooled, idx = max_pool_argmax_flat(jnp.asarray(_nhwc(x)), 3, 2, 1)
    np.testing.assert_allclose(np.asarray(pooled), _nhwc(ref_pooled.numpy()))
    np.testing.assert_array_equal(np.asarray(idx), _nhwc(ref_idx.numpy()))


@pytest.mark.parametrize("hw", [(25, 25), (16, 20)])
def test_max_unpool_flat_decoder_values_matches_torch(rng, hw):
    """Scatter-free flat unpool vs F.max_unpool2d, with a DIFFERENT tensor
    than the pooled maxima (SegResNet unpools the decoder output,
    reference models/segnet.py:246-253). Overlapping windows give duplicate
    indices carrying unequal values; the tap application order reproduces
    torch-CPU's last-write-wins bit-for-bit."""
    from segtpu.ops.pooling import max_pool_argmax_flat, max_unpool_flat

    x = rng.standard_normal((2, 3, *hw)).astype(np.float32)
    _, ref_idx = F.max_pool2d(torch.from_numpy(x), 3, 2, 1,
                              return_indices=True)
    ho, wo = ref_idx.shape[-2:]
    y = rng.standard_normal((2, 3, ho, wo)).astype(np.float32)
    # reference epilogue: unpool the decoder tensor to 2x the pooled grid
    ref = F.max_unpool2d(torch.from_numpy(y), ref_idx, 2, 2).numpy()

    _, idx = max_pool_argmax_flat(jnp.asarray(_nhwc(x)), 3, 2, 1)
    got = np.asarray(max_unpool_flat(jnp.asarray(_nhwc(y)), idx,
                                     (2 * ho, 2 * wo), input_hw=hw))
    np.testing.assert_array_equal(got, _nhwc(ref))


@pytest.mark.parametrize("hw", [(13, 13), (16, 16), (15, 18)])
def test_max_unpool_flat_grad_matches_torch(rng, hw):
    """d(unpool)/dy reads the cotangent at idx — checked against torch
    autograd across odd/even/rectangular pool planes (the round-5 backward
    is tap-decomposed compare+slice+select, not a gather; masks must stay
    exclusive across taps on every geometry)."""
    import jax

    from segtpu.ops.pooling import max_pool_argmax_flat, max_unpool_flat

    x = rng.standard_normal((1, 2, *hw)).astype(np.float32)
    _, ref_idx = F.max_pool2d(torch.from_numpy(x), 3, 2, 1,
                              return_indices=True)
    ho, wo = ref_idx.shape[-2:]
    y = rng.standard_normal((1, 2, ho, wo)).astype(np.float32)
    w = rng.standard_normal((1, 2, 2 * ho, 2 * wo)).astype(np.float32)

    ty = torch.from_numpy(y).requires_grad_(True)
    (F.max_unpool2d(ty, ref_idx, 2, 2) * torch.from_numpy(w)).sum().backward()

    _, idx = max_pool_argmax_flat(jnp.asarray(_nhwc(x)), 3, 2, 1)
    gy = jax.grad(lambda yy: jnp.sum(
        max_unpool_flat(yy, idx, (2 * ho, 2 * wo), input_hw=hw)
        * jnp.asarray(_nhwc(w))))(jnp.asarray(_nhwc(y)))
    np.testing.assert_allclose(np.asarray(gy), _nhwc(ty.grad.numpy()),
                               rtol=1e-6, atol=1e-6)


def test_max_unpool_flat_requires_input_hw(rng):
    """The minimal plane consistent with idx's grid is off by one for
    even-sized pool inputs (reconstructs 15 for an actual 16), so the
    default must refuse rather than silently mis-map flat indices."""
    from segtpu.ops.pooling import max_pool_argmax_flat, max_unpool_flat

    x = rng.standard_normal((1, 2, 16, 16)).astype(np.float32)
    _, idx = max_pool_argmax_flat(jnp.asarray(_nhwc(x)), 3, 2, 1)
    y = jnp.zeros((1, idx.shape[1], idx.shape[2], 2), jnp.float32)
    with pytest.raises(ValueError, match="input_hw"):
        max_unpool_flat(y, idx, (16, 16))


@pytest.mark.parametrize("axis", [0, 1, 2, -1])
def test_fast_argmax_matches_jnp(rng, axis):
    """fast_argmax (max + masked min-over-iota, avoiding XLA's variadic
    reduce — 8 GB/s on TPU for the step's full-res prediction argmax) must
    match jnp.argmax exactly, including first-occurrence tie-breaking."""
    import jax.numpy as jnp

    from segtpu.ops.reductions import fast_argmax

    x = rng.standard_normal((5, 17, 9)).astype(np.float32)
    x[1, 3, 2] = x[1, 3, 7] = 50.0  # tie: first occurrence must win
    x[2, :, 4] = x[2, :, 0]  # ties along other axes
    got = np.asarray(fast_argmax(jnp.asarray(x), axis))
    np.testing.assert_array_equal(got, np.argmax(x, axis))
    xi = rng.integers(-3, 3, (6, 31)).astype(np.int32)
    np.testing.assert_array_equal(
        np.asarray(fast_argmax(jnp.asarray(xi), 1)), np.argmax(xi, 1))


@pytest.mark.parametrize("axis", [0, 1, 2, -1])
def test_packed_argmax_matches_jnp(rng, axis):
    """packed_argmax (single reduce_max over an int32 (bf16-key, rev-index)
    packing) must match jnp.argmax on bfloat16 inputs exactly: ties first-
    occurrence, negatives, +/-inf, and -0.0 vs +0.0 ties."""
    import jax.numpy as jnp

    from segtpu.ops.reductions import packed_argmax

    x = (rng.standard_normal((5, 17, 9)) * 8).astype(np.float32)
    x[1, 3, 2] = x[1, 3, 7] = 50.0  # tie: first occurrence must win
    x[2, :, 4] = x[2, :, 0]  # ties along other axes
    x[0, 1, 3] = np.inf
    x[3, 2, :] = -np.inf
    xb = jnp.asarray(x, jnp.bfloat16)
    np.testing.assert_array_equal(
        np.asarray(packed_argmax(xb, axis)),
        np.argmax(np.asarray(xb, np.float32), axis))
    z = jnp.asarray(np.array([[-0.0, 0.0, -1.0], [0.0, -0.0, -0.0]]),
                    jnp.bfloat16)
    np.testing.assert_array_equal(np.asarray(packed_argmax(z, 1)), [0, 0])
    # all-negative rows (the sign-flip branch of the key mapping)
    neg = jnp.asarray(-np.abs(rng.standard_normal((7, 19))) - 1, jnp.bfloat16)
    np.testing.assert_array_equal(
        np.asarray(packed_argmax(neg, 1)),
        np.argmax(np.asarray(neg, np.float32), 1))
