"""K/V-streaming flash-attention experiment (VERDICT r4 #7).

The resident-K flash kernel (ops/flash_attention.flash_attention_fwd_pallas)
holds the full [Sk, Dp] K/V of one (batch, head) in VMEM — at Dh=64 (padded
to Dp=128) that caps usable sequence length around ~16k tokens and was the
documented bound of the S/8@448 long-sequence path (KNOWN_GAPS.md). The
streamed twin (flash_attention_fwd_pallas_streamed) makes the key axis a
third grid dimension: Pallas double-buffers [block_k, Dp] K/V tiles through
VMEM while the online-softmax carry persists in scratch, so VMEM usage is
independent of S.

This bench measures both at the headline long-seq shape (ViT-S/8 @448:
B=8, H=6, S=3137, Dh=64) and at growing S until the resident kernel stops
fitting, printing one JSON row per point: ms, achieved TF/s (4·B·H·Sq·Sk·Dh
useful FLOPs — Dp padding not counted), % of v5e bf16 peak.
"""

from __future__ import annotations

import json
import sys

V5E_BF16_PEAK_TFS = 197.0


def main() -> None:
    import jax
    import jax.numpy as jnp

    from timetuning_tpu.runtime import setup_compilation_cache
    from timetuning_tpu.ops.flash_attention import (
        flash_attention_fwd_pallas,
        flash_attention_fwd_pallas_streamed,
    )
    from bench_util import time_chained_fps

    setup_compilation_cache()

    def measure(name, fn, B, H, S, Dh, **kw):
        ks = jax.random.split(jax.random.PRNGKey(0), 6)
        mk = jax.jit(lambda k: jax.random.normal(k, (B, H, S, Dh),
                                                 jnp.bfloat16))
        bufs = [tuple(mk(k) for k in ks[i * 3:(i + 1) * 3])
                for i in range(2)]
        try:
            cps = max(
                time_chained_fps(
                    lambda q, k, v: fn(q, k, v, **kw), bufs, iters=20,
                    units_per_call=1.0)
                for _ in range(3)
            )
        except Exception as e:  # VMEM OOM at large S for the resident path
            row = {"impl": name, "B": B, "S": S,
                   "error": type(e).__name__ + ": " + str(e)[:140]}
            print(json.dumps(row), flush=True)
            return row
        flops = 4 * B * H * S * S * Dh
        ms = 1e3 / cps
        tfs = cps * flops / 1e12
        row = {"impl": name, "B": B, "S": S, "ms": round(ms, 3),
               "tf_s": round(tfs, 1),
               "pct_peak": round(100 * tfs / V5E_BF16_PEAK_TFS, 1)}
        print(json.dumps(row), flush=True)
        return row

    B, H, Dh = 8, 6, 64
    S = 3137                       # ViT-S/8 @448 tokens
    measure("resident(defaults)", flash_attention_fwd_pallas, B, H, S, Dh)
    for bk in (512, 1024, 2048):
        measure(f"streamed(bk={bk})", flash_attention_fwd_pallas_streamed,
                B, H, S, Dh, block_k=bk)

    # growing S at constant total tokens (B shrinks): the resident kernel's
    # K/V VMEM grows linearly and eventually stops compiling; the streamed
    # kernel is flat
    for S2, B2 in ((8192, 3), (16384, 1), (32768, 1)):
        measure("resident(defaults)", flash_attention_fwd_pallas,
                B2, H, S2, Dh)
        measure("streamed(bk=1024)", flash_attention_fwd_pallas_streamed,
                B2, H, S2, Dh, block_k=1024)


if __name__ == "__main__":
    sys.exit(main())
