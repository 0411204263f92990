"""Collective-count regression gate (VERDICT r4 #4).

Lowers the dp / dp+ZeRO-1 / dp×tp train steps on the suite's 8-device
virtual CPU mesh and pins the compiled HLO's collective ops against the
committed audit (docs/collectives.json, produced by
tools/audit_collectives.py --write). A code change that adds an unexpected
all-reduce — e.g. a pmean sneaking outside the trainable subtree, or a
sharding annotation regressing to replicated-with-gather — fails here
instead of silently doubling step latency on a pod.

If a change *intentionally* alters the comm pattern, regenerate the pin:
    PYTHONPATH=. JAX_PLATFORMS=cpu python tools/audit_collectives.py --write
and justify the delta in the commit message.
"""

import json
import os
import sys

import pytest

_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if _ROOT not in sys.path:
    sys.path.insert(0, _ROOT)


@pytest.fixture(scope="module")
def audit_results():
    from tools.audit_collectives import audit

    return {p["program"]: p for p in audit()}


@pytest.fixture(scope="module")
def pinned():
    with open(os.path.join(_ROOT, "docs", "collectives.json")) as f:
        return {p["program"]: p for p in json.load(f)["programs"]}


@pytest.mark.parametrize("program", ["dp_step", "dp_zero1_step", "dp_tp_step"])
def test_collectives_match_pin(audit_results, pinned, program):
    got = audit_results[program]
    want = pinned[program]
    got_ops = {k: (v["count"], v["bytes"]) for k, v in got["by_op"].items()}
    want_ops = {k: (v["count"], v["bytes"]) for k, v in want["by_op"].items()}
    assert got_ops == want_ops, (
        f"{program}: collective pattern changed.\n got: {got_ops}\nwant: "
        f"{want_ops}\nIf intended, regenerate docs/collectives.json "
        f"(tools/audit_collectives.py --write) and justify in the commit."
    )


def test_dp_semantic_invariants(audit_results):
    """Backend-agnostic invariants of the dp step's comm surface."""
    dp = audit_results["dp_step"]
    # dp uses ONLY all-reduce (sinkhorn psum + metric pmeans + grad pmean):
    # no gathers — params are replicated, the queue stays device-local.
    assert set(dp["by_op"]) == {"all-reduce"}
    # the grad pmean is restricted to the trainable subtree: total payload
    # must stay well under the FULL param tree's gradient size (~0.5 MB at
    # the tiny config; trainable subtree is ~125 KB)
    assert dp["total_payload_bytes"] < 200_000


def test_zero1_semantic_invariants(audit_results):
    """ZeRO-1 swaps the grad all-reduce for reduce-scatter + psum rebuild."""
    z = audit_results["dp_zero1_step"]
    assert z["by_op"].get("reduce-scatter", {}).get("count") == 1, (
        "ZeRO-1 must reduce-scatter the flat gradient exactly once"
    )
    # far fewer all-reduces than dp (one padded-vector rebuild psum +
    # sinkhorn/metrics) — per-leaf grad all-reduces must NOT reappear
    assert z["by_op"]["all-reduce"]["count"] <= 8
