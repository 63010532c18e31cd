"""Deterministic sampling operators.

Stratified hash-sampling: membership depends ONLY on the row's id (a
Knuth-style multiplicative hash over integer arithmetic that an ANSI-SQL
oracle reproduces exactly) — so samples are reproducible across runs,
retries, cluster sizes and engines, and adding strata later never reshuffles
earlier decisions (REL parity anchor: REL's deterministic train/test corpus
splits, REL:src/REL/generate_train_test.py).

Why not ``Dataset.random_sample``: its membership is seeded per-execution,
not per-row — fine for one-off sampling (see q_sample_lineitem), wrong for
a resumable 100-TB pipeline where a retried block must re-draw the SAME
rows. Zero shuffles either way: one streaming filter pass.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

# 2^31 modulus keeps every intermediate below 2^63 for ANY int64 id
# ((2^31-1) * KNUTH < 2^63), so the SQL twin never overflows BIGINT either.
_MOD = 2_147_483_648
_KNUTH = 2_654_435_761


def sample_bucket(ids) -> np.ndarray:
    """id -> deterministic bucket in [0, 10000). Integer-exact; the SQL twin
    is ``((id % 2147483648) * 2654435761 % 2147483648) % 10000``."""
    x = np.asarray(pc.cast(ids, pa.int64())) % _MOD
    return (x * _KNUTH % _MOD) % 10000


def stratified_sample(ds, *, id_col: str, stratum_col: str,
                      rates_permyriad: dict[str, int],
                      default_permyriad: int = 0, batch_size: int = 8192):
    """Keep each row iff its deterministic id-bucket falls under its
    stratum's rate (in 1/10000 units). Unlisted strata use the default."""
    from ..functions.rayutil import dict_lookup

    def filt(t: pa.Table) -> pa.Table:
        bucket = sample_bucket(t.column(id_col))
        rate = np.asarray(dict_lookup(
            pc.cast(t.column(stratum_col), pa.string()), rates_permyriad,
            default=default_permyriad, value_type=pa.int64()))
        return t.filter(pa.array(bucket < rate))

    return ds.map_batches(filt, batch_format="pyarrow",
                          zero_copy_batch=True, batch_size=batch_size)
