"""Measure the async-checkpoint overlap win on the chip.

A/B: (sync) save(wait=True) then run K train-like steps, vs (async)
save(wait=False), run the same K steps while orbax writes, then
wait_until_finished. The delta is the disk-write time hidden behind
compute. Uses the real large-config TrainState (params + Adam moments,
the same tree `wm-pretrain` checkpoints). Interleaved rounds, one
process (CLAUDE.md bench-noise rule).
"""
import shutil
import tempfile
import time

import jax
import jax.numpy as jnp

from weathermodel_tpu.models.weatherbert import WeatherBERT
from weathermodel_tpu.train.checkpoint import Checkpointer
from weathermodel_tpu.train.state import create_train_state
from weathermodel_tpu.utils.config import model_config_for_size


def main():
    cfg = model_config_for_size("large", max_len=365)
    model = WeatherBERT(cfg)
    B, T = 32, 365
    k = jax.random.PRNGKey(0)
    x = jnp.zeros((B, T, cfg.weather_dim), jnp.float32)
    coords = jnp.zeros((B, 2), jnp.float32)
    years = jnp.zeros((B, T), jnp.float32)
    interval = jnp.ones((B, 1), jnp.float32)
    mask = jnp.zeros((B, T, cfg.weather_dim), bool)
    params = model.init(k, x, coords, years, interval, mask)
    state = create_train_state(params)
    nbytes = sum(x.nbytes for x in jax.tree.leaves(state)) / 1e6
    print(f"train-state size: {nbytes:.0f} MB")

    # stand-in for an epoch's compute: a chain of dummy matmul steps
    w = jax.random.normal(k, (2048, 2048), jnp.bfloat16)

    @jax.jit
    def burn(w):
        def body(c, _):
            return c @ w * 0.999, ()
        out, _ = jax.lax.scan(body, w, None, length=30000)
        return out

    float(burn(w)[0, 0])  # compile

    def epoch_compute():
        out = burn(w)
        return float(out[0, 0])  # honest barrier: host transfer

    t0 = time.perf_counter()
    epoch_compute()
    print(f"epoch-compute stand-in: {time.perf_counter() - t0:.3f}s")

    results = {"sync": [], "async": []}
    for rnd in range(3):
        for mode in ("sync", "async"):
            d = tempfile.mkdtemp()
            ck = Checkpointer(d)
            t0 = time.perf_counter()
            ck.save(1, state, best_val_loss=1.0, output_json={},
                    wait=(mode == "sync"))
            epoch_compute()
            ck.wait_until_finished()
            dt = time.perf_counter() - t0
            results[mode].append(dt)
            print(f"round {rnd} {mode}: {dt:.3f}s")
            shutil.rmtree(d, ignore_errors=True)

    s = min(results["sync"])
    a = min(results["async"])
    print(f"\nbest sync {s:.3f}s, best async {a:.3f}s, "
          f"hidden write time {s - a:.3f}s per checkpointed epoch")


if __name__ == "__main__":
    main()
