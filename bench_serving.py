"""Benchmark: AOT-exported serving artifact throughput (frames/sec/chip).

Exports the dense-feature forward via `cli.export` (StableHLO, weights
embedded, fused Pallas kernels preserved as custom calls), reloads it with
the serving-side loader — no model code — and measures steady-state
throughput with on-device inputs and chained dispatches. Confirms the
serving path matches the live program (`bench.py`).

Prints one JSON line like bench.py. Note the one-time export itself takes
minutes (AOT lowering of the fused program); serving-side load is fast.
"""

from __future__ import annotations

import argparse
import json
import os
import tempfile


def main() -> None:
    p = argparse.ArgumentParser("bench_serving")
    p.add_argument("--architecture", type=str, default="dino-s16")
    p.add_argument("--model_path", type=str, default=None)
    p.add_argument("--batch_size", type=int, default=256)
    p.add_argument("--input_resolution", type=int, default=224)
    p.add_argument("--iters", type=int, default=30)
    args = p.parse_args()

    import jax
    import jax.numpy as jnp

    from timetuning_tpu.runtime import setup_compilation_cache

    setup_compilation_cache()

    from timetuning_tpu.cli.export import export_features, load_exported

    B = args.batch_size
    blob, _live_fn, shape, _mesh = export_features(
        args.architecture, args.model_path, B, args.input_resolution,
        "bfloat16",
    )
    with tempfile.NamedTemporaryFile(suffix=".stablehlo", delete=False) as f:
        f.write(blob)
        path = f.name
    try:
        fn = load_exported(path)
    finally:
        os.unlink(path)

    from bench_util import time_chained_fps

    make = jax.jit(
        lambda key: jax.random.randint(key, shape, 0, 255, jnp.uint8)
    )
    bufs = [(make(jax.random.PRNGKey(i)),) for i in range(2)]
    fps = time_chained_fps(fn, bufs, iters=args.iters, units_per_call=B)
    print(json.dumps({
        "metric": "serving_artifact_fps",
        "value": round(fps, 1),
        "unit": f"frames/sec/chip (exported StableHLO, "
                f"{args.architecture} @ {args.input_resolution}, bf16)",
        "artifact_mb": round(len(blob) / 1e6, 1),
        "vs_baseline": None,
    }))


if __name__ == "__main__":
    main()
