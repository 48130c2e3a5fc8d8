"""Dump the train step's server-compiled HLO for span attribution.

The r8 session used this to close the training-profile attribution
question: trace spans carry XLA fusion names (add_add_fusion.2, ...)
whose actual contents are only visible in the optimized HLO —
`.lower().compile().as_text()` returns it (compiled by the remote TPU
service, so run it like any other single TPU process). Finding that
mattered: the r7 trace's 64.4 ms "optimizer" span was the FORWARD fc2
GEMM (metadata op_name `jvp(...)/layers/fc2/dot_general`), while the
real optax-adamw update was already fused into 31 per-leaf one-pass
tuple fusions near its HBM floor (docs/PERF.md "compiled-HLO dump").

Writes /tmp/train_hlo.txt (~1.1 MB). Grep fusion names from a
profile against it; each instruction line carries `metadata={op_name}`
(the model source op) and `backend_config` (estimated_cycles from the
server cost model)."""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))
from pigeon_tpu.core.compile_cache import enable_persistent_cache
enable_persistent_cache()
import jax, jax.numpy as jnp, numpy as np
from pigeon_tpu.config import HeadConfig, vit_l14_336_vision
from pigeon_tpu.models.super_guessr import SuperGuessr
from pigeon_tpu.train import create_train_state
from pigeon_tpu.train.train_loop import adamw, make_train_step

os.environ["PIGEON_FUSED_BWD"] = "kernel"
batch = 48
vision_cfg = vit_l14_336_vision()
head_cfg = HeadConfig(num_cells=2203, embed_dim=1024, panorama=False,
                      multi_task=True)
size = vision_cfg.image_size
cells = np.stack([np.linspace(-170, 170, head_cfg.num_cells),
                  np.linspace(-55, 65, head_cfg.num_cells)],
                 -1).astype(np.float32)
ks = jax.random.split(jax.random.PRNGKey(5), 7)
dev_batch = {
    "inputs": jax.random.normal(ks[0], (batch, size, size, 3), jnp.float32),
    "labels": jnp.stack(
        [jax.random.uniform(ks[1], (batch,), minval=-170, maxval=170),
         jax.random.uniform(ks[2], (batch,), minval=-55, maxval=65)], -1),
    "labels_clf": jax.random.randint(ks[3], (batch,), 0, head_cfg.num_cells),
    "labels_multi_task": jax.random.normal(ks[4], (batch, 6)),
    "labels_climate": jax.random.randint(ks[5], (batch,), 0, 28),
    "labels_month": jax.random.randint(ks[6], (batch,), 0, 12),
}
model = SuperGuessr(vision_cfg, head_cfg, dtype=jnp.bfloat16,
                    attn_impl="flash_fused", remat="attn_kernel")
opt = adamw(2e-5)
state = create_train_state(jax.random.PRNGKey(0), model, opt,
                           (jnp.zeros((2, size, size, 3)),))
step = make_train_step(model, opt, head_cfg, cells, donate=False)
lowered = jax.jit(lambda s, b, r: step(s, b, r)).lower(
    state, dev_batch, jax.random.PRNGKey(7))
comp = lowered.compile()
txt = comp.as_text()
open("/tmp/train_hlo.txt", "w").write(txt)
print("HLO chars:", len(txt))
