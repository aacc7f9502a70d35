"""One-shot TPU profiling session: batch scaling + stage split."""
import time

import jax
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
import numpy as np
import jax.numpy as jnp

from aprilgrid_tpu.pipeline import saddle_frontend, detect_pipeline
from aprilgrid_tpu.config import DEFAULT_PARAMS as PAR, CONSTANTS as C, DEFAULT_CAPACITIES as CAP
from aprilgrid_tpu.families import get_family
from aprilgrid_tpu.oracle.numpy_ref import load_image

spec = get_family("t36h11")
img = load_image("tests/data/two_boards.png")

def log(msg):
    print(f"[{time.strftime('%H:%M:%S')}] {msg}", flush=True)

# 1) raw elementwise bandwidth probe
big = jnp.ones((2048, 1024), jnp.float32)
f1 = jax.jit(lambda a: (a * 1.5 + 0.1).sum())
float(f1(big))
t0 = time.time()
for _ in range(10):
    r = f1(big)
float(r)
log(f"1 fused op + reduce on 2M f32: {(time.time()-t0)*100:.2f} ms/call")

# 2) frontend only, single frame
fe1 = jax.jit(lambda im: saddle_frontend(im, PAR, C, CAP))
o = fe1(jnp.asarray(img)); np.asarray(o[0].valid)
t0 = time.time()
for _ in range(5):
    o = fe1(jnp.asarray(img))
np.asarray(o[0].valid)
log(f"frontend single 1080p: {(time.time()-t0)*200:.1f} ms/call")

# 3) full detect batch scaling
for B in (1, 4):
    imgs = jnp.asarray(np.broadcast_to(img, (B,) + img.shape).copy())
    fullB = jax.jit(jax.vmap(lambda im: detect_pipeline(im, spec, PAR, C, CAP)))
    t0 = time.time()
    o = fullB(imgs); np.asarray(o.valid)
    log(f"full detect B={B}: compile+run {time.time()-t0:.1f}s")
    t0 = time.time()
    for _ in range(3):
        o = fullB(imgs)
    np.asarray(o.valid)
    log(f"full detect B={B}: {(time.time()-t0)/3*1000:.1f} ms/call = {B/((time.time()-t0)/3):.1f} fps")

# 4) frontend batch 4
imgs4 = jnp.asarray(np.broadcast_to(img, (4,) + img.shape).copy())
feB = jax.jit(jax.vmap(lambda im: saddle_frontend(im, PAR, C, CAP)))
o = feB(imgs4); np.asarray(o[0].valid)
t0 = time.time()
for _ in range(3):
    o = feB(imgs4)
np.asarray(o[0].valid)
log(f"frontend B=4: {(time.time()-t0)/3*1000:.1f} ms/call")
log("done")
