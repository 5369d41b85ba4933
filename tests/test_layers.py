"""Layer-level parity tests vs torch (CPU): Conv, ConvTranspose, BatchNorm."""

import numpy as np
import pytest
import torch
import torch.nn.functional as TF

import jax
import jax.numpy as jnp

from segtpu.nn.layers import BatchNorm, Conv, ConvTranspose


def _nhwc(t):
    return np.transpose(t, (0, 2, 3, 1))


@pytest.mark.parametrize(
    "stride,padding,dilation,groups",
    [(1, 1, 1, 1), (2, 1, 1, 1), (1, 2, 2, 1), (1, 1, 1, 4), (2, 3, 3, 1)],
)
def test_conv_matches_torch(rng, stride, padding, dilation, groups):
    B, H, W, Cin, Cout, K = 2, 16, 16, 8, 12, 3
    x = rng.normal(size=(B, Cin, H, W)).astype(np.float32)
    w = rng.normal(size=(Cout, Cin // groups, K, K)).astype(np.float32)
    b = rng.normal(size=(Cout,)).astype(np.float32)

    ref = TF.conv2d(torch.from_numpy(x), torch.from_numpy(w), torch.from_numpy(b),
                    stride=stride, padding=padding, dilation=dilation, groups=groups)

    mod = Conv(Cout, K, stride, padding, dilation, groups)
    params = {"params": {"kernel": jnp.asarray(np.transpose(w, (2, 3, 1, 0))),
                         "bias": jnp.asarray(b)}}
    out = mod.apply(params, jnp.asarray(_nhwc(x)))
    np.testing.assert_allclose(
        np.asarray(out), _nhwc(ref.numpy()), rtol=1e-4, atol=1e-4)


@pytest.mark.parametrize(
    "k,stride,padding,output_padding",
    [(2, 2, 0, 0), (4, 2, 1, 0), (3, 2, 1, 1), (3, 1, 1, 0)],
)
def test_conv_transpose_matches_torch(rng, k, stride, padding, output_padding):
    B, H, W, Cin, Cout = 2, 9, 11, 6, 5
    x = rng.normal(size=(B, Cin, H, W)).astype(np.float32)
    w = rng.normal(size=(Cin, Cout, k, k)).astype(np.float32)
    b = rng.normal(size=(Cout,)).astype(np.float32)

    ref = TF.conv_transpose2d(torch.from_numpy(x), torch.from_numpy(w),
                              torch.from_numpy(b), stride=stride, padding=padding,
                              output_padding=output_padding)

    mod = ConvTranspose(Cout, k, stride, padding, output_padding)
    # torch kernel (I, O, kh, kw) -> HWIO
    params = {"params": {"kernel": jnp.asarray(np.transpose(w, (2, 3, 0, 1))),
                         "bias": jnp.asarray(b)}}
    out = mod.apply(params, jnp.asarray(_nhwc(x)))
    np.testing.assert_allclose(
        np.asarray(out), _nhwc(ref.numpy()), rtol=1e-4, atol=1e-4)


def test_batchnorm_train_and_eval_match_torch(rng):
    B, H, W, C = 4, 8, 8, 16
    x = rng.normal(size=(B, C, H, W)).astype(np.float32) * 3 + 1
    tbn = torch.nn.BatchNorm2d(C)
    with torch.no_grad():
        tbn.weight.copy_(torch.from_numpy(rng.normal(size=(C,)).astype(np.float32)))
        tbn.bias.copy_(torch.from_numpy(rng.normal(size=(C,)).astype(np.float32)))

    mod = BatchNorm()
    variables = {
        "params": {"scale": jnp.asarray(tbn.weight.detach().numpy()),
                   "bias": jnp.asarray(tbn.bias.detach().numpy())},
        "batch_stats": {"mean": jnp.zeros((C,)), "var": jnp.ones((C,))},
    }

    # two training steps: outputs AND running stats must track torch
    for step in range(2):
        xs = x + step
        ref = tbn(torch.from_numpy(xs))
        out, mutated = mod.apply(variables, jnp.asarray(_nhwc(xs)),
                                 use_running_average=False,
                                 mutable=["batch_stats"])
        variables = {"params": variables["params"], **mutated}
        np.testing.assert_allclose(np.asarray(out), _nhwc(ref.detach().numpy()),
                                   rtol=1e-4, atol=1e-4)

    np.testing.assert_allclose(np.asarray(variables["batch_stats"]["mean"]),
                               tbn.running_mean.numpy(), rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(variables["batch_stats"]["var"]),
                               tbn.running_var.numpy(), rtol=1e-4, atol=1e-4)

    # eval mode uses the running stats
    tbn.eval()
    ref = tbn(torch.from_numpy(x))
    out = mod.apply(variables, jnp.asarray(_nhwc(x)), use_running_average=True)
    np.testing.assert_allclose(np.asarray(out), _nhwc(ref.detach().numpy()),
                               rtol=1e-4, atol=1e-4)


def test_batchnorm_syncs_across_data_shards():
    """Batch stats must be global when the batch is sharded over the mesh —
    the behavior the reference needs 741 LoC of SyncBN for."""
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    devs = np.array(jax.devices()[:8]).reshape(8)
    mesh = Mesh(devs, ("data",))
    B, H, W, C = 16, 4, 4, 8
    x = np.random.default_rng(1).normal(size=(B, H, W, C)).astype(np.float32)

    mod = BatchNorm()
    variables = {
        "params": {"scale": jnp.ones((C,)), "bias": jnp.zeros((C,))},
        "batch_stats": {"mean": jnp.zeros((C,)), "var": jnp.ones((C,))},
    }

    def fwd(v, xx):
        return mod.apply(v, xx, use_running_average=False, mutable=["batch_stats"])

    ref_out, ref_mut = fwd(variables, jnp.asarray(x))

    xs = jax.device_put(jnp.asarray(x), NamedSharding(mesh, P("data")))
    out, mut = jax.jit(fwd)(variables, xs)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref_out), rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(mut["batch_stats"]["mean"]),
                               np.asarray(ref_mut["batch_stats"]["mean"]),
                               rtol=1e-5, atol=1e-6)
