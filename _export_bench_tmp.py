import time

import jax
import jax.numpy as jnp

from timetuning_tpu.runtime import setup_compilation_cache

setup_compilation_cache()

from timetuning_tpu.cli.export import export_features, load_exported

B = 256
blob, live_fn, shape = export_features("dino-s16", None, B, 224, "bfloat16")
with open("/tmp/feat.stablehlo", "wb") as f:
    f.write(blob)
print("artifact MB:", round(len(blob) / 1e6, 1), flush=True)
fn = load_exported("/tmp/feat.stablehlo")

make = jax.jit(
    lambda key: jax.random.randint(key, shape, 0, 255, jnp.uint8)
)
bufs = [make(jax.random.PRNGKey(i)) for i in range(2)]
for i in range(4):
    float(jnp.asarray(fn(bufs[i % 2])).mean())

iters = 30
t0 = time.perf_counter()
for i in range(iters):
    out = fn(bufs[i % 2])
float(jnp.asarray(out).mean())
dt = time.perf_counter() - t0
print(f"exported-artifact serving: {iters * B / dt:.0f} frames/s/chip")
