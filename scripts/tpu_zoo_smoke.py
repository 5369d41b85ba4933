"""One train step per zoo model on the real TPU — catches TPU-only lowering
issues (e.g. ops that work on CPU but fail Mosaic/XLA:TPU)."""
import sys, os; sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np
import jax, jax.numpy as jnp
from segtpu.core import create_train_state, make_mesh, make_optimizer, make_train_step, shard_batch
from segtpu.losses import cross_entropy
from segtpu.models import get_model

CASES = [
    ("UNet", {}),
    ("UNetResnet", {"backbone": "resnet50"}),
    ("SegNet", {}),
    ("SegResNet", {}),
    ("ENet", {}),
    ("GCN", {"backbone": "resnet50"}),
    ("GCN", {"backbone": "resnet50", "use_resnet_gcn": True, "use_deconv": True}),
    ("DeepLab", {"backbone": "resnet50", "output_stride": 16}),
    ("DeepLab", {"backbone": "xception", "output_stride": 16}),
    ("DeepLab_DUC_HDC", {"backbone": "resnet50"}),
    ("UperNet", {"backbone": "resnet50"}),
    ("PSPNet", {"backbone": "resnet50"}),
    ("PSPDenseNet", {"backbone": "densenet121"}),
    ("FCN8", {}),
]

mesh = make_mesh()
rng = np.random.default_rng(0)
NC, HW, B = 7, 64, 2
imgs, labels = shard_batch(mesh, (
    rng.normal(size=(B, HW, HW, 3)).astype(np.float32),
    rng.integers(0, NC, size=(B, HW, HW)).astype(np.int32)))
ok = fail = 0
for name, kwargs in CASES:
    tag = f"{name}({','.join(f'{k}={v}' for k, v in kwargs.items())})"
    try:
        model = get_model(name, num_classes=NC, **kwargs)
        tx = make_optimizer(lr=0.01, num_epochs=1, iters_per_epoch=10)
        state = create_train_state(model, tx, jax.random.PRNGKey(0),
                                   jnp.zeros((1, HW, HW, 3), jnp.float32))
        step = make_train_step(model, cross_entropy, NC, mesh=mesh)
        state, loss, stats = step(state, imgs, labels, jax.random.PRNGKey(1))
        lv = float(loss)
        assert np.isfinite(lv), lv
        print(f"OK   {tag}: loss {lv:.4f}", flush=True)
        ok += 1
    except Exception as e:
        print(f"FAIL {tag}: {type(e).__name__}: {str(e)[:200]}", flush=True)
        fail += 1
print(f"{ok} ok, {fail} failed", flush=True)
sys.exit(1 if fail else 0)
