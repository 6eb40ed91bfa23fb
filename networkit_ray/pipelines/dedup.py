"""Deduplication operators over the documents table — the training-data
pipeline family: exact (hash), MinHash+LSH, SimHash, n-gram Jaccard,
embedding-cosine near-dup.

Scale shapes:
- exact_dedup: hash column added per batch (vectorized) -> one pre-combined
  groupby(sha).min(doc_id).  At 100 TB this is THE dedup primitive: the
  shuffle moves (sha, doc_id) pairs only, never text.
- minhash_lsh_*: shingle->minhash per batch (stateless, vectorized numpy),
  explode to (band, band_hash, doc_id) rows, groupby bands -> candidate
  pairs (only same-bucket pairs, never all-pairs), verify true Jaccard,
  union-find the verified pairs into duplicate groups.  Candidate-pair and
  verification volume is output-bound, not n² — the standard web-dedup
  pipeline (Broder/LSH).
- simhash: 64-bit signature; near-dup candidates via 4x16-bit band
  collisions (any pair at Hamming distance ≤3 shares a band by pigeonhole).
- jaccard_similar_pairs: exact all-pairs token-set Jaccard (small-side
  broadcast via ray.put; O(n²) — the SQL-checkable baseline; LSH is the
  scale path).
- embedding near-dup lives in pipelines/similarity.py (cosine kernels).
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
import pyarrow as pa

from ray.data.aggregate import Min

from networkit_ray.state.unionfind import UnionFind

MERSENNE = (1 << 61) - 1


def _text_sha(batch: pa.Table, text_col="text") -> pa.Table:
    sha = [
        hashlib.sha256((s or "").encode()).hexdigest()
        for s in batch[text_col].to_pylist()
    ]
    return batch.append_column("sha", pa.array(sha, type=pa.string()))


def exact_dedup(docs_ds, id_col="doc_id", text_col="text", num_partitions=8):
    """-> Dataset(sha, doc_id): min doc_id kept per distinct text hash."""

    def pre(t: pa.Table) -> pa.Table:
        t = _text_sha(t, text_col)
        return (
            t.select(["sha", id_col])
            .group_by("sha")
            .aggregate([(id_col, "min")])
            .rename_columns(["sha", id_col])
        )

    return (
        docs_ds.map_batches(pre, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("sha", num_partitions=num_partitions)
        .aggregate(Min(id_col, alias_name=id_col))
    )


# ---- MinHash + LSH --------------------------------------------------------


_SH_C1 = np.uint64(0x9E3779B97F4A7C15)
_SH_C2 = np.uint64(0xC2B2AE3D27D4EB4F)


def _token_hashes(toks: list[str]) -> np.ndarray:
    """Deterministic 64-bit token hashes, vectorized (pandas siphash —
    fixed key, stable across runs/processes unlike Python's hash())."""
    if not toks:
        return np.empty(0, dtype=np.uint64)
    return pd.util.hash_array(np.asarray(toks, dtype=object))


def _shingles(text: str, k: int = 3) -> np.ndarray:
    """Word k-gram shingle hashes — vectorized rolling combination of
    per-token hashes (one C-speed hash pass, no per-gram Python)."""
    th = _token_hashes((text or "").split())
    n = len(th)
    if n == 0:
        return np.zeros(1, dtype=np.uint64)
    if n < k:
        h = np.uint64(0)
        for i in range(n):
            h = h * _SH_C1 + th[i]
        return np.array([h], dtype=np.uint64)
    acc = np.zeros(n - k + 1, dtype=np.uint64)
    for j in range(k):  # k tiny (3): vectorized over all positions
        acc = acc * _SH_C1 + th[j : n - k + 1 + j] * _SH_C2
    return np.unique(acc)


def _perm_params(num_perm: int, seed: int = 42):
    # a,b < 2^31 and 32-bit shingle hashes keep a*x+b inside uint64 with no
    # modulus needed — fully vectorized universal hashing
    rng = np.random.default_rng(seed)
    a = rng.integers(1, 1 << 31, size=num_perm, dtype=np.uint64)
    b = rng.integers(0, 1 << 31, size=num_perm, dtype=np.uint64)
    return a, b


class MinHasher:
    """Actor-pool stage: permutation params generated once per actor."""

    def __init__(self, num_perm: int = 64, k: int = 3, seed: int = 42):
        self.a, self.b = _perm_params(num_perm, seed)
        self.num_perm = num_perm
        self.k = k

    def signature(self, text: str) -> np.ndarray:
        xs = (_shingles(text, self.k) & np.uint64(0xFFFFFFFF)).astype(np.uint64)
        v = self.a[:, None] * xs[None, :] + self.b[:, None]
        return v.min(axis=1)

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        sigs = np.stack([self.signature(t) for t in batch["text"].fillna("")])
        out = {"doc_id": batch["doc_id"].to_numpy(np.int64)}
        out["sig"] = list(sigs)
        return pd.DataFrame(out)


def minhash_band_rows(docs_ds, num_perm=64, bands=16, k=3, seed=42, concurrency=None):
    """documents -> (band, band_hash, doc_id) rows for the LSH groupby."""
    rows_per_band = num_perm // bands

    class Bander(MinHasher):
        def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
            ids, band_ids, band_hashes = [], [], []
            for doc_id, text in zip(batch["doc_id"], batch["text"].fillna("")):
                sig = self.signature(text)
                for b in range(bands):
                    chunk = sig[b * rows_per_band : (b + 1) * rows_per_band]
                    h = int.from_bytes(
                        hashlib.blake2b(chunk.tobytes(), digest_size=8).digest(),
                        "big",
                    ) >> 1
                    ids.append(int(doc_id))
                    band_ids.append(b)
                    band_hashes.append(h)
            return pd.DataFrame(
                {
                    "band": np.array(band_ids, dtype=np.int64),
                    "band_hash": np.array(band_hashes, dtype=np.int64),
                    "doc_id": np.array(ids, dtype=np.int64),
                }
            )

    return docs_ds.map_batches(
        Bander,
        fn_constructor_kwargs={"num_perm": num_perm, "k": k, "seed": seed},
        batch_format="pandas",
        concurrency=concurrency or 4,
        num_cpus=0.5,
    )


def candidate_pairs(band_rows_ds, num_partitions=8):
    """LSH bucket pairs via self-join on (band, band_hash) — vectorized.

    A groupby().map_groups over the buckets costs per-group Python overhead
    on ~#docs x bands mostly-singleton groups; the hash self-join emits the
    same within-bucket pairs in one vectorized exchange.  Pairs found in
    multiple bands are deduped by a pre-combined groupby.
    """
    band_rows_ds = band_rows_ds.materialize()  # self-join on shared lineage
    joined = band_rows_ds.join(
        band_rows_ds,
        join_type="inner",
        num_partitions=num_partitions,
        on=("band", "band_hash"),
        left_suffix="_l",
        right_suffix="_r",
    )

    def mk_pairs(t: pa.Table) -> pa.Table:
        a = t["doc_id_l"].combine_chunks().to_numpy(zero_copy_only=False)
        b = t["doc_id_r"].combine_chunks().to_numpy(zero_copy_only=False)
        keep = a < b
        out = pa.table({"a": a[keep], "b": b[keep]})
        return out.group_by(["a", "b"]).aggregate([])  # local pre-dedup

    pairs = joined.map_batches(mk_pairs, batch_format="pyarrow", zero_copy_batch=True)
    return (
        pairs.groupby(["a", "b"], num_partitions=num_partitions)
        .count()
        .select_columns(["a", "b"])
    )


def _jaccard(sa: np.ndarray, sb: np.ndarray) -> float:
    inter = len(np.intersect1d(sa, sb, assume_unique=True))
    union = len(sa) + len(sb) - inter
    return inter / union if union else 1.0


def minhash_dedup_groups(
    docs_ds,
    num_perm=64,
    bands=16,
    k=3,
    threshold=0.7,
    num_partitions=8,
    seed=42,
):
    """Full MinHash-LSH near-dup pipeline -> Dataset(doc_id, dup_group).

    dup_group = min doc_id of the verified-duplicate component (exact
    Jaccard >= threshold on word-k-gram shingle sets).  Docs with no
    duplicate map to themselves.
    """
    band_rows = minhash_band_rows(docs_ds, num_perm, bands, k, seed)
    cands = candidate_pairs(band_rows, num_partitions).materialize()

    def _self_groups(t):
        return pa.table({"doc_id": t["doc_id"], "dup_group": t["doc_id"]})

    if cands.count() == 0:
        # no LSH candidates at all: every doc is its own group (an
        # entirely-empty join side crashes Ray 2.49 shuffles — compat.py)
        return docs_ds.select_columns(["doc_id"]).map_batches(
            _self_groups, batch_format="pyarrow", zero_copy_batch=True
        )

    texts = docs_ds.select_columns(["doc_id", "text"]).materialize()
    # explicit projections between chained joins (Ray 2.49 mis-plans
    # rename/select Projects on unmaterialized join outputs — compat.py)
    j1 = cands.join(
        texts,
        join_type="inner",
        num_partitions=num_partitions,
        on=("a",),
        right_on=("doc_id",),
    ).map_batches(
        lambda t: pa.table({"a": t["a"], "b": t["b"], "text_a": t["text"]}),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )
    j2 = j1.join(
        texts,
        join_type="inner",
        num_partitions=num_partitions,
        on=("b",),
        right_on=("doc_id",),
    ).map_batches(
        lambda t: pa.table(
            {"a": t["a"], "b": t["b"], "text_a": t["text_a"], "text_b": t["text"]}
        ),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )

    def verify(df: pd.DataFrame) -> pd.DataFrame:
        keep_a, keep_b, jac = [], [], []
        for a, b, ta, tb in zip(df["a"], df["b"], df["text_a"], df["text_b"]):
            sa, sb = _shingles(ta, k), _shingles(tb, k)
            jv = _jaccard(sa, sb)
            if jv >= threshold:
                keep_a.append(int(a))
                keep_b.append(int(b))
                jac.append(jv)
        return pd.DataFrame(
            {"a": np.array(keep_a, dtype=np.int64),
             "b": np.array(keep_b, dtype=np.int64),
             "jaccard": np.array(jac, dtype=np.float64)}
        )

    verified = j2.map_batches(verify, batch_format="pandas")

    # duplicate components: verified pairs are tiny vs the corpus ->
    # union-find reducer (same contraction story as components.py)
    uf = UnionFind()
    for b in verified.select_columns(["a", "b"]).iter_batches(
        batch_format="pyarrow", batch_size=None
    ):
        uf.union_arrays(
            b["a"].to_numpy(zero_copy_only=False), b["b"].to_numpy(zero_copy_only=False)
        )
    vids, roots = uf.roots()
    import ray.data

    root_ds = ray.data.from_arrow(pa.table({"doc_id": vids, "grp": roots}))
    return (
        docs_ds.select_columns(["doc_id"])
        .join(root_ds, join_type="left_outer", num_partitions=num_partitions, on=("doc_id",))
        .map_batches(
            lambda t: pa.table(
                {
                    "doc_id": t["doc_id"],
                    "dup_group": pa.compute.coalesce(t["grp"], t["doc_id"]),
                }
            ),
            batch_format="pyarrow",
            zero_copy_batch=True,
        )
    )


# ---- SimHash --------------------------------------------------------------


def simhash64(text: str) -> int:
    """Charikar simhash over word features — fully vectorized: one hash
    pass over tokens, one (n_tokens x 64) bit unpack, one column sum."""
    th = _token_hashes((text or "").split())
    if len(th) == 0:
        return 0
    bits = (th[:, None] >> np.arange(64, dtype=np.uint64)[None, :]) & np.uint64(1)
    acc = (2 * bits.astype(np.int64) - 1).sum(axis=0)
    out = np.uint64(0)
    pos = np.flatnonzero(acc > 0)
    for i in pos:
        out |= np.uint64(1) << np.uint64(i)
    return int(out)


def simhash_signatures(docs_ds):
    def mk(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "doc_id": df["doc_id"].to_numpy(np.int64),
                "simhash": np.array(
                    [simhash64(t) for t in df["text"].fillna("")], dtype=np.uint64
                ).view(np.int64),
            }
        )

    return docs_ds.map_batches(mk, batch_format="pandas")


def simhash_candidates(docs_ds, num_partitions=8):
    """Band 64-bit simhash into 4x16-bit keys -> candidate pairs with any
    shared band (catches all pairs at Hamming distance <= 3)."""
    sigs = simhash_signatures(docs_ds)

    def explode(df: pd.DataFrame) -> pd.DataFrame:
        sh = df["simhash"].to_numpy(np.int64).view(np.uint64)
        ids = df["doc_id"].to_numpy(np.int64)
        rows = []
        for band in range(4):
            chunk = ((sh >> np.uint64(band * 16)) & np.uint64(0xFFFF)).astype(np.int64)
            rows.append(
                pd.DataFrame(
                    {"band": band, "band_hash": chunk, "doc_id": ids, "simhash": sh.view(np.int64)}
                )
            )
        return pd.concat(rows, ignore_index=True)

    exploded = sigs.map_batches(explode, batch_format="pandas")

    def pairs(df: pd.DataFrame) -> pd.DataFrame:
        if len(df) < 2:
            return pd.DataFrame({"a": [], "b": [], "ha": [], "hb": []}).astype(np.int64)
        d = df.sort_values("doc_id")
        ids = d["doc_id"].to_numpy(np.int64)
        hs = d["simhash"].to_numpy(np.int64)
        ai, bi = np.triu_indices(len(ids), k=1)
        return pd.DataFrame({"a": ids[ai], "b": ids[bi], "ha": hs[ai], "hb": hs[bi]})

    cand = exploded.groupby(["band", "band_hash"], num_partitions=num_partitions).map_groups(
        pairs, batch_format="pandas"
    )
    return cand.groupby(["a", "b"], num_partitions=num_partitions).aggregate(
        Min("ha", alias_name="ha"), Min("hb", alias_name="hb")
    )


def simhash_near_dups(docs_ds, max_hamming=3, num_partitions=8):
    """-> Dataset(a, b, hamming) pairs with Hamming distance <= max_hamming."""
    cand = simhash_candidates(docs_ds, num_partitions)

    def ham(df: pd.DataFrame) -> pd.DataFrame:
        x = df["ha"].to_numpy(np.int64).view(np.uint64) ^ df["hb"].to_numpy(
            np.int64
        ).view(np.uint64)
        d = np.zeros(len(x), dtype=np.int64)
        for i in range(64):
            d += ((x >> np.uint64(i)) & np.uint64(1)).astype(np.int64)
        out = pd.DataFrame(
            {"a": df["a"].to_numpy(np.int64), "b": df["b"].to_numpy(np.int64), "hamming": d}
        )
        return out[out["hamming"] <= max_hamming]

    return cand.map_batches(ham, batch_format="pandas")


# ---- exact all-pairs token Jaccard (SQL-checkable baseline) ---------------


def jaccard_similar_pairs(docs_ds, threshold=0.5, num_partitions=8):
    """All-pairs Jaccard over distinct-word sets -> (a, b, jaccard >= t).

    Brute force with the full (doc_id -> token-set) map broadcast via
    ray.put and each batch compared against it (a < b de-dup).  O(n²) —
    the verifiable baseline; minhash_dedup_groups is the scale path.
    """
    import ray

    docs = docs_ds.select_columns(["doc_id", "text"])
    all_sets = {}
    for b in docs.iter_batches(batch_format="pyarrow", batch_size=None):
        for i, t in zip(b["doc_id"].to_pylist(), b["text"].to_pylist()):
            all_sets[int(i)] = frozenset((t or "").split())
    ref = ray.put(all_sets)

    class Compare:
        def __init__(self, ref, threshold):
            self.sets = ray.get(ref)
            self.ids = np.array(sorted(self.sets), dtype=np.int64)
            self.t = threshold

        def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
            a_out, b_out, j_out = [], [], []
            for a, ta in zip(df["doc_id"], df["text"].fillna("")):
                sa = frozenset(ta.split())
                if not sa:
                    continue
                for b_id in self.ids[self.ids > int(a)]:
                    sb = self.sets[int(b_id)]
                    if not sb:
                        continue
                    inter = len(sa & sb)
                    union = len(sa) + len(sb) - inter
                    j = inter / union if union else 1.0
                    if j >= self.t:
                        a_out.append(int(a))
                        b_out.append(int(b_id))
                        j_out.append(j)
            return pd.DataFrame(
                {
                    "a": np.array(a_out, dtype=np.int64),
                    "b": np.array(b_out, dtype=np.int64),
                    "jaccard": np.array(j_out, dtype=np.float64),
                }
            )

    return docs.map_batches(
        Compare,
        fn_constructor_kwargs={"ref": ref, "threshold": threshold},
        batch_format="pandas",
        concurrency=4,
        num_cpus=0.5,
    )
