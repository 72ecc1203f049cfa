"""AOT compile-check of the fused training megakernel at a given shape.

The axon compile helper is chipless, so this validates VMEM fit on the real
TPU compiler without occupying the chip.  Usage:

  python scripts/compile_check_fused.py [n] [m] [hidden] [B] [seg]
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 1000
    m = int(sys.argv[2]) if len(sys.argv) > 2 else 1000
    h = int(sys.argv[3]) if len(sys.argv) > 3 else 800
    B = int(sys.argv[4]) if len(sys.argv) > 4 else 2
    seg = int(sys.argv[5]) if len(sys.argv) > 5 else 0

    from iadmm_tpu.kernels.train_rollout import (make_fused_chunk_loss,
                                                 pick_segment_len, _round_up)
    from iadmm_tpu.types import QPBatch, init_state
    from iadmm_tpu.solvers import cells

    stream = None
    if len(sys.argv) > 6:
        stream = bool(int(sys.argv[6]))
    K = int(os.environ.get("IADMM_CHECK_K", 100))
    J = seg or pick_segment_len(_round_up(n, 128), _round_up(m, 128), h, K)
    print(f"n={n} m={m} h={h} B={B} K={K} -> segment J={J} "
          f"stream={stream}", flush=True)
    fused = make_fused_chunk_loss(
        num_var=n, num_constr=m, batch=B, hidden=h, sigma=6e-6,
        chunk_len=K, outer_T=K, K_total=K,
        **(dict(stream=True) if stream else dict(seg=J)))
    print(f"variant: stream={fused.stream} J={fused.segment_len}",
          flush=True)

    key = jax.random.PRNGKey(0)
    ks = jax.random.split(key, 8)
    data = QPBatch(
        Q=jax.random.normal(ks[0], (B, n, n), jnp.float32) * 0.01,
        p=jax.random.normal(ks[1], (B, n), jnp.float32),
        A0=jax.random.normal(ks[2], (B, m, n), jnp.float32) * 0.01,
        zl=-jnp.ones((B, m), jnp.float32),
        zu=jnp.ones((B, m), jnp.float32),
        eq_mask=jnp.zeros((B, m), bool))
    params = cells.lstm_init(ks[3], 2, h, K)
    st = init_state(B, n, m, h)

    def loss_fn(p):
        l, _ = fused(p, st, data, jnp.asarray(0, jnp.int32))
        return l

    t0 = time.time()
    lowered = jax.jit(jax.value_and_grad(loss_fn)).lower(params)
    print(f"lowered in {time.time() - t0:.1f}s", flush=True)
    t0 = time.time()
    compiled = lowered.compile()
    print(f"compiled in {time.time() - t0:.1f}s", flush=True)
    try:
        mem = compiled.memory_analysis()
        print("memory_analysis:", mem, flush=True)
    except Exception as e:  # noqa: BLE001
        print("memory_analysis unavailable:", e, flush=True)
    print("COMPILE OK", flush=True)


if __name__ == "__main__":
    main()
