"""Speed-of-light probe for the int8 serving-kernel question (VERDICT r4
weak #1 / next #6).

The serving megakernel (kernels/rollout_kernel.py) is bound by the
recurrent gate GEMM  H (S, h) @ U (h, 4h)  — ~94 TF/s realized ≈ the XLA
bf16 floor.  The only precision lever left is int8 (v5e MXU: 2x bf16
peak), but H is produced fresh every iteration, so serving-time int8 pays
a per-step VPU quantization of H.  Round 1 measured +6% end-to-end in the
megakernel; the hypothesized fix was amortizing the quantization *scale*
over J steps.

This bench isolates the question at the exact flagship gate shapes,
entirely in XLA (no Pallas variables to confound):

  a) bf16 GEMM                       — the current kernel's inner op
  b) int8 GEMM, pre-quantized H      — the unreachable upper bound
  c) int8 GEMM + per-step H quantize (fresh scale)    — honest serving
  d) int8 GEMM + per-step quantize with a CACHED scale — the amortized fix

If (c)/(d) do not beat (a) by a useful margin at these shapes, the serve
path is speed-of-light-closed at bf16 and the int8 lever is retired with
numbers instead of a hunch.

Writes artifacts/int8_gates_bench.json.
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np
import jax
import jax.numpy as jnp


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def time_loop(step, carry0, iters, reps, label):
    @jax.jit
    def loop(c):
        return jax.lax.fori_loop(0, iters, lambda _, c: step(c), c)

    t0 = time.perf_counter()
    out = loop(carry0)
    float(np.asarray(jax.tree.leaves(out)[0]).sum())
    log(f"  {label}: compile+first {time.perf_counter() - t0:.1f}s")
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        out = loop(carry0)
        float(np.asarray(jax.tree.leaves(out)[0]).sum())
        best = min(best, (time.perf_counter() - t0) / iters)
    return best


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--S", type=int, default=2048)   # n+m tokens (flagship)
    ap.add_argument("--h", type=int, default=800)
    ap.add_argument("--B", type=int, default=8)
    ap.add_argument("--iters", type=int, default=30)
    ap.add_argument("--reps", type=int, default=3)
    args = ap.parse_args()
    S, h, B = args.S, args.h, args.B
    log(f"backend: {jax.default_backend()}  S={S} h={h} B={B}")

    rng = np.random.default_rng(0)
    U16 = jnp.asarray(rng.standard_normal((h, 4 * h)), jnp.bfloat16)
    # int8 weights: symmetric per-tensor quantization
    U8_scale = jnp.float32(np.abs(np.asarray(U16, np.float32)).max() / 127)
    U8 = jnp.asarray(
        np.clip(np.round(np.asarray(U16, np.float32) / float(U8_scale)),
                -127, 127), jnp.int8)
    H0 = jnp.asarray(rng.standard_normal((B * S, h)), jnp.float32)
    flops = 2 * (B * S) * h * 4 * h

    def mix(gates):
        # stand-in for the elementwise cell math: keep the carry bounded
        # and feed the next H from the gates so nothing is dead-code
        return jnp.tanh(gates[:, :h])

    rows = {}

    def bf16_step(Hc):
        gates = jax.lax.dot_general(
            Hc.astype(jnp.bfloat16), U16, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        return mix(gates)

    rows["bf16_s"] = time_loop(bf16_step, H0, args.iters, args.reps, "bf16")

    def int8_prequant_step(Hq):
        # upper bound: H already int8, no per-step quantize cost
        gates = jax.lax.dot_general(
            Hq, U8, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32)
        g = gates.astype(jnp.float32) * (U8_scale * U8_scale)
        Hn = mix(g)
        return jnp.clip(jnp.round(Hn / U8_scale), -127, 127).astype(jnp.int8)

    Hq0 = jnp.clip(jnp.round(H0 / U8_scale), -127, 127).astype(jnp.int8)
    # prequant includes ONE requant of the (B*S, h) activation per step —
    # the honest recurrent case (H is reproduced each iteration)
    rows["int8_requant_s"] = time_loop(int8_prequant_step, Hq0,
                                       args.iters, args.reps,
                                       "int8 (cached scale, requant/step)")

    def int8_fresh_scale_step(Hc):
        s = jnp.abs(Hc).max() / 127 + 1e-12          # fresh per-step scale
        Hq = jnp.clip(jnp.round(Hc / s), -127, 127).astype(jnp.int8)
        gates = jax.lax.dot_general(
            Hq, U8, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32)
        g = gates.astype(jnp.float32) * (s * U8_scale)
        return mix(g)

    rows["int8_fresh_scale_s"] = time_loop(int8_fresh_scale_step, H0,
                                           args.iters, args.reps,
                                           "int8 (fresh scale/step)")

    out = dict(S=S, h=h, B=B, iters=args.iters,
               backend=jax.default_backend(),
               flops_per_step=flops, **rows)
    out["bf16_tflops"] = flops / rows["bf16_s"] / 1e12
    out["int8_requant_speedup"] = rows["bf16_s"] / rows["int8_requant_s"]
    out["int8_fresh_speedup"] = rows["bf16_s"] / rows["int8_fresh_scale_s"]
    os.makedirs("artifacts", exist_ok=True)
    with open("artifacts/int8_gates_bench.json", "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
