import sys, os; sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import time, numpy as np
import jax, jax.numpy as jnp
from segtpu.core import create_train_state, make_mesh, make_optimizer, make_eval_step, make_train_step, shard_batch
from segtpu.losses import cross_entropy, lovasz_softmax
from segtpu.models import get_model

CROP=769; B=8
mesh = make_mesh()
model = get_model("PSPNet", num_classes=19, backbone="resnet50", use_aux=True)
tx = make_optimizer(lr=0.01, num_epochs=100, iters_per_epoch=1000)
state = create_train_state(model, tx, jax.random.PRNGKey(0), jnp.zeros((1,CROP,CROP,3), jnp.float32))
rng=np.random.default_rng(0)
im, lb = shard_batch(mesh, (rng.normal(size=(B,CROP,CROP,3)).astype(np.float32), rng.integers(0,19,size=(B,CROP,CROP)).astype(np.int32)))

estep = make_eval_step(model, cross_entropy, 19, mesh=mesh)
for _ in range(2):
    loss, stats = estep(state, im, lb)
float(loss)
t0=time.perf_counter(); N=10
for _ in range(N):
    loss, stats = estep(state, im, lb)
float(loss)
dt=time.perf_counter()-t0
print(f"eval: {B*N/dt:.2f} img/s ({dt/N*1000:.0f} ms/step)", flush=True)

# Lovasz train step cost
tstep = make_train_step(model, lovasz_softmax, 19, mesh=mesh)
key=jax.random.PRNGKey(1)
for _ in range(2):
    state, loss, _ = tstep(state, im, lb, key)
float(loss)
t0=time.perf_counter(); N=5
for _ in range(N):
    state, loss, _ = tstep(state, im, lb, key)
float(loss)
dt=time.perf_counter()-t0
print(f"lovasz train: {B*N/dt:.2f} img/s ({dt/N*1000:.0f} ms/step)", flush=True)
