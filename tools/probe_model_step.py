#!/usr/bin/env python
"""TPU probe: cls-ssg / semseg-ssg ball-path train-step times with the
Pallas FPS wired in (README round-2 rows: cls ball bf16 88 ms @ B=32,
semseg ball bf16 104 ms @ B=16)."""
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax
    import jax.numpy as jnp
    from pctpu.nn.config import TrainConfig
    from pctpu.nn import train as T

    for model, B, N, nc in (("cls-ssg", 32, 4096, 40),
                            ("semseg-ssg", 16, 4096, 13)):
        cfg = TrainConfig(model=model, num_classes=nc, num_points=N,
                          batch_size=B, grouping="ball",
                          compute_dtype="bfloat16")
        rng = jax.random.PRNGKey(0)
        feat_dim = 6 if model.startswith("cls") else 9
        pc = jax.random.normal(rng, (B, N, feat_dim))
        labels = (jnp.zeros((B,), jnp.int32) if model.startswith("cls")
                  else jnp.zeros((B, N), jnp.int32))
        mdl, state = T.create_train_state(cfg, rng, pc)
        step = jax.jit(T.make_train_step(mdl, cfg))
        t0 = time.perf_counter()
        state, m = step(state, pc, labels, rng)
        np.asarray(m["loss"])
        compile_s = time.perf_counter() - t0
        reps = 10
        t0 = time.perf_counter()
        for i in range(reps):
            state, m = step(state, pc, labels, jax.random.fold_in(rng, i))
        np.asarray(m["loss"])
        dt = (time.perf_counter() - t0) / reps
        print(f"{model} ball bf16 B={B}: {dt*1e3:.1f} ms/step "
              f"(compile {compile_s:.0f}s, loss={float(m['loss']):.3f})",
              flush=True)


if __name__ == "__main__":
    main()
