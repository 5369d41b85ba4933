"""Inference modes: sliding-window count normalization, flip averaging,
multi-scale averaging."""

import numpy as np

from segtpu.inference_lib import multi_scale_predict, sliding_predict

NC = 4


def _linear_predictor(x):
    """Fake model: logits[c] = c * mean_channels(x). Shape-preserving and
    flip-equivariant, so flip-averaging must be exact."""
    x = np.asarray(x)
    base = x.mean(-1, keepdims=True)
    return np.concatenate([base * (c + 1) for c in range(NC)], axis=-1)


def test_sliding_covers_everything_and_normalizes():
    img = np.random.default_rng(0).normal(size=(50, 70, 3)).astype(np.float32)
    out = sliding_predict(_linear_predictor, img, NC, flip=False)
    assert out.shape == (50, 70, NC)
    # the fake model is spatially pointwise, so tiling+normalization must
    # reproduce the single-shot result exactly (away from pad regions)
    ref = _linear_predictor(img[None])[0]
    np.testing.assert_allclose(out, ref, rtol=1e-5, atol=1e-5)


def test_sliding_flip_is_exact_for_equivariant_model():
    img = np.random.default_rng(1).normal(size=(40, 40, 3)).astype(np.float32)
    out = sliding_predict(_linear_predictor, img, NC, flip=True)
    ref = _linear_predictor(img[None])[0]
    np.testing.assert_allclose(out, ref, rtol=1e-5, atol=1e-5)


def test_sliding_chunked_matches_unchunked_at_cityscapes_size():
    """Chunked tile batches (bounded HBM) must be bit-identical to the
    one-big-batch path at real Cityscapes eval geometry (1024x2048 -> ~32
    tiles x2 flip), and must observe the cap with ONE compiled shape."""
    img = np.random.default_rng(3).normal(size=(1024, 2048, 3)).astype(
        np.float32)

    seen_batches = []

    def tracking_predictor(x):
        seen_batches.append(len(x))
        return _linear_predictor(x)

    out_unchunked = sliding_predict(_linear_predictor, img, NC, flip=True,
                                    max_tile_batch=None)
    out_chunked = sliding_predict(tracking_predictor, img, NC, flip=True,
                                  max_tile_batch=8)
    np.testing.assert_array_equal(out_chunked, out_unchunked)
    assert len(set(seen_batches)) == 1 and seen_batches[0] == 8, seen_batches

    # multiscale over a chunk-capped sliding predictor stays finite too
    out_ms = multi_scale_predict(_linear_predictor, img[:128, :256], [0.75, 1.0],
                                 NC, flip=True)
    assert np.isfinite(out_ms).all()


def test_multi_scale_shapes_and_identity_scale():
    img = np.random.default_rng(2).normal(size=(32, 48, 3)).astype(np.float32)
    out = multi_scale_predict(_linear_predictor, img, [1.0], NC)
    ref = _linear_predictor(img[None])[0]
    np.testing.assert_allclose(out, ref, rtol=1e-4, atol=1e-4)

    out2 = multi_scale_predict(_linear_predictor, img, [0.75, 1.0, 1.5], NC,
                               flip=True)
    assert out2.shape == (32, 48, NC)
    assert np.isfinite(out2).all()


def test_bucketed_predictor_crops_back():
    import jax
    import jax.numpy as jnp
    import flax.linen as nn

    from segtpu.inference_lib import make_predictor

    class Pointwise(nn.Module):
        @nn.compact
        def __call__(self, x, train=False):
            return {"out": nn.Conv(NC, (1, 1))(x)}

    model = Pointwise()
    x = jnp.asarray(np.random.default_rng(0).normal(
        size=(1, 50, 70, 3)).astype(np.float32))
    v = model.init(jax.random.PRNGKey(0), x)
    exact = make_predictor(model, v["params"], {})
    bucketed = make_predictor(model, v["params"], {}, bucket=32)
    ye = np.asarray(exact(x))
    yb = np.asarray(bucketed(x))
    assert yb.shape == ye.shape == (1, 50, 70, NC)
    # pointwise model: padding cannot leak, results identical
    np.testing.assert_allclose(yb, ye, rtol=1e-6, atol=1e-6)

    # compute_dtype: activations run in bf16 (layers ride the input dtype,
    # nn/layers.py:107) but logits come back float32, close to the exact path
    bf16 = make_predictor(model, v["params"], {}, compute_dtype=jnp.bfloat16)
    yh = np.asarray(bf16(x))
    assert yh.dtype == np.float32 and yh.shape == ye.shape
    np.testing.assert_allclose(yh, ye, rtol=0.05, atol=0.05)
    assert (yh.argmax(-1) == ye.argmax(-1)).mean() > 0.98


def test_inference_cli_without_dataset_on_disk(tmp_path):
    """A checkpoint dir + an image dir is ALL the inference CLI needs: the
    config comes from the checkpoint's meta.json and VOC's stats come from
    its manifest — no VOCdevkit tree anywhere (the reference needs the
    training dataset on disk, inference.py:106-110)."""
    import argparse

    import jax
    import jax.numpy as jnp
    from PIL import Image

    import inference as inference_cli
    from segtpu.checkpoint import save_checkpoint
    from segtpu.core import create_train_state, make_optimizer
    from segtpu.models import get_model

    config = {
        "name": "NoDiskRun",
        "arch": {"type": "UNet", "args": {}},
        "train_loader": {"type": "VOC",
                         "args": {"data_dir": "/nonexistent", "batch_size": 2,
                                  "split": "train", "crop_size": 64}},
        "loss": "CrossEntropyLoss2d",
        "trainer": {"epochs": 1},
    }
    model = get_model("UNet", num_classes=21)
    tx = make_optimizer(lr=0.01, num_epochs=1, iters_per_epoch=1)
    state = create_train_state(model, tx, jax.random.PRNGKey(0),
                               jnp.zeros((1, 64, 64, 3), jnp.float32))
    save_checkpoint(str(tmp_path), "best_model", state, 1, 0.0, config, "UNet")

    img_dir = tmp_path / "imgs"
    img_dir.mkdir()
    rng = np.random.default_rng(0)
    Image.fromarray(rng.integers(0, 255, (40, 56, 3)).astype(np.uint8)).save(
        img_dir / "a.jpg")

    args = argparse.Namespace(
        config=str(tmp_path / "does_not_exist.json"),  # must not be needed
        model=str(tmp_path / "best_model"), images=str(img_dir),
        output=str(tmp_path / "out"), mode="simple", extension="jpg",
        bucket=None)
    inference_cli.run(args)
    assert (tmp_path / "out" / "a.png").exists()


def test_dataset_meta_is_disk_free():
    import inference as inference_cli

    for t, extra, nc in (("VOC", {}, 21),
                         ("CityScapes", {"mode": "fine"}, 19),
                         ("ADE20K", {"split": "training"}, 150),
                         ("COCO", {"partition": "CocoStuff10k"}, 182),
                         ("DeepScene", {"split": "training"}, 7)):
        cfg = {"train_loader": {
            "type": t, "args": {"data_dir": "/nonexistent",
                                "split": extra.pop("split", "train"),
                                **extra}}}
        mean, std, pal, num_classes = inference_cli.dataset_meta(cfg)
        assert num_classes == nc and len(mean) == 3 and len(pal) >= nc * 3
