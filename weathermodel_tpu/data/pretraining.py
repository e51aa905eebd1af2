"""Pretraining batch pipeline: chunk files -> HBM-resident sharded batches.

Replaces the reference's StreamingDataset/DataLoader
(pretraining_dataloader.py:19-382) with a host-side generator that:
  * selects train/validation chunk ids (fixed VALIDATION_CHUNK_IDS; DRY_RUN
    subset — reference :314-320),
  * shards the chunk list per HOST for multi-host jobs (reference per-rank
    slicing :330-341); within one host the global batch is sharded over the
    device mesh by `shard_batch` instead,
  * derives per-timestep years year = 1984 + (chunk_idx*365 + t)*interval/365
    (reference :250-256) and filters samples reaching the cutoff year
    (reference :276-277),
  * shuffles within chunks and emits FIXED-SIZE global batches (static
    shapes for jit; remainder carried over to the next chunk, dropped only
    at epoch end).

Masks are NOT generated here — they are drawn on device inside the jitted
train step (weathermodel_tpu/train/steps.py), same distributions.
"""

import dataclasses
import logging
import os
import random
from typing import Iterator, List, Optional, Sequence, Tuple

import numpy as np

logger = logging.getLogger(__name__)

from weathermodel_tpu.data.chunks import chunk_path, load_chunk
from weathermodel_tpu.train.steps import Batch
from weathermodel_tpu.utils.constants import (
    DATA_DIR,
    DRY_RUN,
    DRY_RUN_TRAIN_CHUNK_IDS,
    NUM_DATASET_PARTS,
    PRETRAIN_CUTOFF_YEAR,
    VALIDATION_CHUNK_IDS,
)


@dataclasses.dataclass(frozen=True)
class PretrainDataConfig:
    data_dir: str = DATA_DIR
    batch_size: int = 256           # global batch
    freqs: Tuple[str, ...] = ("weekly",)  # reference currently streams only
                                          # the weekly file of each triple
                                          # (pretraining_dataloader.py:196-198)
    cutoff_year: float = PRETRAIN_CUTOFF_YEAR
    num_parts: int = NUM_DATASET_PARTS
    dry_run: bool = DRY_RUN


def split_chunk_ids(
    split: str,
    cfg: PretrainDataConfig,
    num_hosts: int = 1,
    host_id: int = 0,
) -> List[int]:
    """Train/validation chunk ids with optional per-host contiguous
    sharding (reference :330-341: truncate to a multiple of world size,
    contiguous slice per rank)."""
    if cfg.dry_run:
        train = [i for i in DRY_RUN_TRAIN_CHUNK_IDS if i < cfg.num_parts]
        val = [i for i in VALIDATION_CHUNK_IDS[:4] if i < cfg.num_parts]
    else:
        train = sorted(
            set(range(cfg.num_parts)).difference(VALIDATION_CHUNK_IDS)
        )
        val = [i for i in VALIDATION_CHUNK_IDS if i < cfg.num_parts]
    ids = train if split == "train" else val
    if num_hosts > 1:
        per_host = len(ids) // num_hosts
        ids = ids[host_id * per_host:(host_id + 1) * per_host]
    return ids


def derive_years(chunk_indices: np.ndarray, intervals: np.ndarray,
                 seq_len: int) -> np.ndarray:
    """year[n, t] = 1984 + (segment_idx*365 + t) * interval / 365
    (reference :250-256)."""
    t = np.arange(seq_len, dtype=np.float32)[None, :]
    abs_idx = chunk_indices[:, None] * 365.0 + t
    return 1984.0 + abs_idx * intervals[:, None] / 365.0


def _load_chunk_arrays(cfg: PretrainDataConfig, freq: str, chunk_id: int):
    w, c, idx = load_chunk(chunk_path(cfg.data_dir, freq, chunk_id))
    seq_len = w.shape[1]
    years = derive_years(idx[:, 0], idx[:, 1], seq_len)
    intervals = idx[:, 1:2]
    keep = years.max(axis=1) < cfg.cutoff_year
    return w[keep], c[keep], years[keep], intervals[keep]


def pretrain_batches(
    split: str,
    cfg: PretrainDataConfig,
    shuffle: bool = False,
    seed: int = 0,
    num_hosts: int = 1,
    host_id: int = 0,
) -> Iterator[Batch]:
    """Yields fixed-size numpy Batch tuples (no masks). Chunk order and
    within-chunk order reshuffled per `seed` (pass epoch-dependent seeds)."""
    ids = split_chunk_ids(split, cfg, num_hosts, host_id)
    rng = random.Random(seed)
    npr = np.random.default_rng(seed)
    plan = [(freq, cid) for cid in ids for freq in cfg.freqs]
    # tolerate partially-materialized chunk stores (subset downloads)
    missing = [(f, c) for f, c in plan
               if not os.path.exists(chunk_path(cfg.data_dir, f, c))]
    if missing:
        logger.warning(
            "%d/%d %s chunks missing on disk (e.g. %s); skipping them",
            len(missing), len(plan), split, missing[0],
        )
        plan = [fc for fc in plan if fc not in set(missing)]
    if shuffle:
        rng.shuffle(plan)

    carry: Optional[List[np.ndarray]] = None
    bs = cfg.batch_size
    for k, (freq, cid) in enumerate(plan):
        # overlap the NEXT chunk's disk read + decode with this chunk's
        # training steps (native background thread; no-op without the lib)
        if k + 1 < len(plan):
            from weathermodel_tpu.data import native_io

            nf, nc = plan[k + 1]
            native_io.prefetch(chunk_path(cfg.data_dir, nf, nc))
        w, c, y, itv = _load_chunk_arrays(cfg, freq, cid)
        if w.shape[0] == 0:
            continue
        if shuffle:
            perm = npr.permutation(w.shape[0])
            w, c, y, itv = w[perm], c[perm], y[perm], itv[perm]
        if carry is not None:
            w = np.concatenate([carry[0], w])
            c = np.concatenate([carry[1], c])
            y = np.concatenate([carry[2], y])
            itv = np.concatenate([carry[3], itv])
            carry = None
        n_full = w.shape[0] // bs
        for i in range(n_full):
            sl = slice(i * bs, (i + 1) * bs)
            yield Batch(w[sl], c[sl], y[sl], itv[sl])
        rem = w.shape[0] - n_full * bs
        if rem:
            carry = [w[-rem:], c[-rem:], y[-rem:], itv[-rem:]]
    # Epoch-end remainder: training drops it (static shapes; the
    # reference's DataLoader yielded a short final batch — we trade that
    # for jit stability). Validation zero-PADS it to the static batch size
    # with per-sample weights 0 on the padding rows, so the val metric is
    # EXACT for any val-set size (same 0/1-weight mechanism as the yield
    # path, data/yield_data.py).
    if carry is not None and split != "train":
        w, c, y, itv = carry
        n = w.shape[0]
        pad = bs - n
        weight = np.concatenate(
            [np.ones(n, np.float32), np.zeros(pad, np.float32)]
        )

        def z(a):
            return np.concatenate(
                [a, np.zeros((pad,) + a.shape[1:], a.dtype)]
            )

        logger.info(
            "validation remainder of %d samples zero-padded (weight 0) to "
            "the global batch of %d", n, bs,
        )
        yield Batch(z(w), z(c), z(y), z(itv), weight)
