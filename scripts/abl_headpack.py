"""Round-3 directive #1 experiment: head-packed MXU layouts for attention.

Hypothesis under test (VERDICT r2): hd=36 wastes 72% of every 128-lane K/N
MXU tile; packing 3 heads (3x36=108 lanes) per pass with block-diagonal
masking should cut attention matmul time up to ~2.8x.

Counter-analysis (this round): MXU time ~ M x ceil(N/128) x ceil(K/128) per
matmul; block-diagonal packing trades K-padding for extra N tiles (scores)
or N-padding for extra K tiles (AV) EXACTLY 1:1, so the pass count is
conserved and packing should be neutral at best (the block-diagonal
construction itself costs VPU passes + VMEM).

This microbench settles it with measurements of the matmul patterns in
isolation (no softmax, identical IO, dropout off):

  V0 (current): per head j: S_j = q_j @ k_j^T  [384,36]x[36,384];
                            O_j = S_j @ v_j    [384,384]x[384,36]
  V1 (packed):  per group of 3 heads: build block-diag Kbd [108, 3*384]
                and Vbd [3*384, 108] in VMEM scratch;
                S3 = q3 @ Kbd [384, 1152];  O3 = S3 @ Vbd [384, 108]

Run: nohup python scripts/abl_headpack.py > /tmp/abl_headpack.log 2>&1 &

MEASURED (v5e-1, 2026-08-17): V0 3.484 ms, V1 3.708 ms — the packed
variant is SLOWER even though it computes only 15 of 16 heads (g=3 does
not divide nh=16; the last head is skipped, hence the reported rel-err —
the 15 computed heads agree). Per useful head the packed form is ~13%
slower: pass-count conservation holds, and the block-diagonal scratch
construction adds pure overhead. Negative result recorded in BASELINE.md
round-3; closes VERDICT r2 directive #1's "try the head-packing lever".
"""

import functools
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

B, TP, H, NH, HD = 224, 384, 576, 16, 36
G = 3            # heads per packed group
BLOCK_B = 2
STEPS = 30


def bench(fn, *args, tag):
    out = fn(*args)
    float(jnp.sum(out.astype(jnp.float32)))
    t0 = time.perf_counter()
    for _ in range(STEPS):
        out = fn(*args)
    float(jnp.sum(out.astype(jnp.float32)))
    dt = (time.perf_counter() - t0) / STEPS
    print(f"{tag}: {dt * 1e3:.3f} ms", flush=True)
    return dt


def _v0_kernel(q_ref, k_ref, v_ref, o_ref):
    def body(i, _):
        for j in range(NH):
            sl = slice(j * HD, (j + 1) * HD)
            s = jax.lax.dot_general(
                q_ref[i, :, sl], k_ref[i, :, sl], (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)
            o = jnp.dot(s.astype(q_ref.dtype), v_ref[i, :, sl],
                        preferred_element_type=jnp.float32)
            o_ref[i, :, sl] = o.astype(o_ref.dtype)
        return 0

    jax.lax.fori_loop(0, BLOCK_B, body, 0)


def _v1_kernel(q_ref, k_ref, v_ref, o_ref, kbd_ref, vbd_ref):
    n_groups = NH // G
    gw = G * HD                          # 108 packed lanes

    def body(i, _):
        for g in range(n_groups):
            sl = slice(g * gw, (g + 1) * gw)
            # block-diagonal stacks (no transposes — both matmuls contract
            # on the LAST dim of the block-diag operand):
            #   Kbd [G*TP, gw]: rows j*TP.. cols j*HD.. = k_j
            #   Vbd [G*TP, gw]: same layout with v_j
            kbd_ref[...] = jnp.zeros_like(kbd_ref)
            vbd_ref[...] = jnp.zeros_like(vbd_ref)
            for j in range(G):
                hs = slice((g * G + j) * HD, (g * G + j + 1) * HD)
                kbd_ref[j * TP:(j + 1) * TP, j * HD:(j + 1) * HD] = (
                    k_ref[i, :, hs])
                vbd_ref[j * TP:(j + 1) * TP, j * HD:(j + 1) * HD] = (
                    v_ref[i, :, hs])
            # S3[a, b] = sum_c q3[a, c] Kbd[b, c]  -> [TP, G*TP], block j
            # of columns = S_j (cross-head terms vanish on the zeros)
            s3 = jax.lax.dot_general(
                q_ref[i, :, sl], kbd_ref[...], (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)
            # O3 = S3 @ Vbd -> [TP, gw], cols j*HD.. = S_j @ v_j
            o3 = jnp.dot(s3.astype(q_ref.dtype), vbd_ref[...],
                         preferred_element_type=jnp.float32)
            o_ref[i, :, sl] = o3.astype(o_ref.dtype)
        return 0

    jax.lax.fori_loop(0, BLOCK_B, body, 0)


def _spec():
    return pl.BlockSpec((BLOCK_B, TP, H), lambda i: (i, 0, 0),
                        memory_space=pltpu.VMEM)


def run_v0(q, k, v):
    return pl.pallas_call(
        _v0_kernel,
        grid=(B // BLOCK_B,),
        in_specs=[_spec()] * 3,
        out_specs=_spec(),
        out_shape=jax.ShapeDtypeStruct(q.shape, q.dtype),
    )(q, k, v)


def run_v1(q, k, v):
    return pl.pallas_call(
        _v1_kernel,
        grid=(B // BLOCK_B,),
        in_specs=[_spec()] * 3,
        out_specs=_spec(),
        out_shape=jax.ShapeDtypeStruct(q.shape, q.dtype),
        scratch_shapes=[
            pltpu.VMEM((G * TP, G * HD), jnp.bfloat16),
            pltpu.VMEM((G * TP, G * HD), jnp.bfloat16),
        ],
    )(q, k, v)


if __name__ == "__main__":
    print(f"devices: {jax.devices()}", flush=True)
    rng = np.random.default_rng(0)
    q = jnp.asarray(rng.normal(size=(B, TP, H)), jnp.bfloat16)
    k = jnp.asarray(rng.normal(size=(B, TP, H)), jnp.bfloat16)
    v = jnp.asarray(rng.normal(size=(B, TP, H)), jnp.bfloat16)

    # correctness cross-check on a tiny slice first
    o0 = np.asarray(jax.jit(run_v0)(q, k, v)[:2], np.float32)
    o1 = np.asarray(jax.jit(run_v1)(q, k, v)[:2], np.float32)
    err = np.max(np.abs(o0 - o1)) / (np.max(np.abs(o0)) + 1e-9)
    print(f"v0 vs v1 rel err: {err:.2e}", flush=True)

    bench(jax.jit(run_v0), q, k, v, tag=f"V0 per-head matmuls (B={B})")
    bench(jax.jit(run_v1), q, k, v, tag=f"V1 packed block-diag g={G} (B={B})")
