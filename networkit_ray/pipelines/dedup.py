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
import pyarrow.compute as pc

from ray.data.aggregate import Min


MERSENNE = (1 << 61) - 1


def _text_sha(batch: pa.Table, text_col="text") -> pa.Table:
    """sha256 per document, bit-identical to hashing the utf-8 text row by
    row, but with the Python overhead stripped: the string column is cast
    to binary (zero-copy — Arrow strings ARE utf-8, so no re-encode), the
    loop touches only `bytes -> digest`, and the hex string column is built
    by ONE binascii.hexlify + a from_buffers StringArray (no per-row
    hexdigest() str objects)."""
    import binascii

    arr = batch[text_col]
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    arr = pc.fill_null(arr, "").cast(pa.binary())
    n = len(arr)
    sha = hashlib.sha256
    digests = bytearray()
    for b in arr.to_pylist():
        digests += sha(b).digest()
    hexs = binascii.hexlify(bytes(digests))
    offsets = np.arange(0, 64 * (n + 1), 64, dtype=np.int32)
    sha_arr = pa.Array.from_buffers(
        pa.utf8(), n, [None, pa.py_buffer(offsets.tobytes()), pa.py_buffer(hexs)]
    )
    return batch.append_column("sha", sha_arr)


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


def _band_hashes(sigs: np.ndarray, bands: int) -> np.ndarray:
    """(n_docs, num_perm) uint64 signature matrix -> (n_docs, bands) int63
    band hashes — one vectorized splitmix-style mixing pass per band lane
    (replaces a per-doc-per-band Python blake2b loop; any well-mixing
    deterministic hash is valid for LSH bucketing)."""
    n, num_perm = sigs.shape
    r = num_perm // bands
    lanes = sigs.reshape(n, bands, r)
    h = np.full((n, bands), np.uint64(0x9E3779B97F4A7C15), dtype=np.uint64)
    for j in range(r):  # r is small (4): vectorized over all docs x bands
        h ^= lanes[:, :, j]
        h *= _SH_C1
        h ^= h >> np.uint64(29)
        h *= _SH_C2
    h ^= h >> np.uint64(32)
    return (h >> np.uint64(1)).astype(np.int64)  # int63: safe int64 join key


class Bander(MinHasher):
    """Actor-pool stage: (doc_id, text) -> one row per (doc, band) with the
    band bucket hash; optionally carries the doc's shingle-hash set so the
    bucket self-join can verify exact Jaccard inline (no extra text joins).
    """

    def __init__(self, num_perm=64, bands=16, k=3, seed=42, carry_shingles=False):
        super().__init__(num_perm=num_perm, k=k, seed=seed)
        self.bands = bands
        self.carry = carry_shingles

    def __call__(self, batch: pd.DataFrame) -> pa.Table:
        texts = batch["text"].fillna("").tolist()
        ids = batch["doc_id"].to_numpy(np.int64)
        n, bands = len(texts), self.bands
        # np.unique after the 32-bit mask: masking can collapse distinct
        # 64-bit shingles onto one value, and the inline verify's
        # intersect1d(assume_unique=True) + |union| arithmetic need true sets
        shingle_sets = [
            np.unique((_shingles(t, self.k) & np.uint64(0xFFFFFFFF)).astype(np.uint64))
            for t in texts
        ]
        sigs = np.empty((n, self.num_perm), dtype=np.uint64)
        for i, xs in enumerate(shingle_sets):
            sigs[i] = (self.a[:, None] * xs[None, :] + self.b[:, None]).min(axis=1)
        bh = _band_hashes(sigs, bands)
        cols = {
            "band": np.tile(np.arange(bands, dtype=np.int64), n),
            "band_hash": bh.reshape(-1),
            "doc_id": np.repeat(ids, bands),
        }
        out = pa.table(cols)
        if self.carry:
            # each doc's shingle set as raw int64 bytes, repeated once per
            # band (doc-major row order matches the columns above).  Binary,
            # not list<int64>: Arrow's acero join rejects nested payload
            # columns but passes var-length binary through untouched.
            blobs = [s.view(np.int64).tobytes() for s in shingle_sets]
            out = out.append_column(
                "toks",
                pa.array(
                    [bl for bl in blobs for _ in range(bands)],
                    type=pa.large_binary(),
                ),
            )
        return out


def minhash_band_rows(docs_ds, num_perm=64, bands=16, k=3, seed=42, concurrency=None,
                      carry_shingles=False):
    """documents -> (band, band_hash, doc_id[, toks]) rows for the LSH
    bucket self-join.  ``carry_shingles`` duplicates each doc's shingle-hash
    set onto its ``bands`` rows so downstream verification needs no join
    back to the corpus — the shuffle ships ~bands x shingle-bytes instead of
    re-exchanging raw text twice (the sf-scale win; for shingle-heavy docs a
    co-partitioned join-verify over (doc_id -> toks) would ship less — see
    minhash_dedup_groups docstring).

    Runs as a TASK pool, not an actor pool: the per-worker state (two
    64-element permutation vectors) costs microseconds to build, so actor
    spin-up would be pure overhead — actors are reserved for stages with
    genuinely expensive setup (models, indexes)."""

    def band_fn(batch: pd.DataFrame) -> pa.Table:
        return Bander(
            num_perm=num_perm, bands=bands, k=k, seed=seed,
            carry_shingles=carry_shingles,
        )(batch)

    return docs_ds.map_batches(band_fn, batch_format="pandas")


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


def doc_shingles(docs_ds, k=3):
    """documents -> (sid, toks): each doc's masked word-k-gram shingle-hash
    set as raw int64 bytes (bit-identical to the sets Bander carries, so
    both verify variants accept/reject exactly the same pairs)."""

    def f(df: pd.DataFrame) -> pa.Table:
        ids = df["doc_id"].to_numpy(np.int64)
        blobs = [
            np.unique((_shingles(t, 3 if k is None else k) & np.uint64(0xFFFFFFFF))
                      .astype(np.uint64)).view(np.int64).tobytes()
            for t in df["text"].fillna("")
        ]
        return pa.table(
            {"sid": ids, "toks": pa.array(blobs, type=pa.large_binary())}
        )

    return docs_ds.map_batches(f, batch_format="pandas")


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
    driver_pair_limit=2_000_000,
    verify="auto",
):
    """Full MinHash-LSH near-dup pipeline -> Dataset(doc_id, dup_group).

    dup_group = min doc_id of the verified-duplicate component (exact
    Jaccard >= threshold on word-k-gram shingle sets).  Docs with no
    duplicate map to themselves.

    Shape (one wide exchange total): band rows CARRY each doc's shingle-hash
    set, so the (band, band_hash) bucket self-join delivers both sides'
    sets to the verifier in the same task — exact Jaccard is checked inline
    and raw text never re-shuffles.  Verified pairs are output-bound-small:
    they stream to a driver union-find, and the resulting root map is
    broadcast (ray.put) into a final stateless map — no corpus-wide join.
    Two verify variants, both checking the SAME masked shingle sets:

    - ``verify="carry"`` (one wide exchange): band rows duplicate each
      doc's shingle set onto its ``bands`` rows; the bucket self-join
      delivers both sides to the verifier inline.  Shuffle volume =
      bands x shingle-bytes per doc.
    - ``verify="join"`` (three narrower exchanges): band rows stay skinny;
      candidate pairs are globally deduped first, then verified via TWO
      co-partitioned joins against a once-materialized (doc_id -> toks)
      table.  Shuffle volume ~ 2 x shingle-bytes per doc plus the pair
      set — the winner for shingle-heavy docs.
    - ``verify="auto"`` samples 256 docs and picks ``join`` when the
      average shingle payload exceeds ~0.5 KB (i.e. when the bands-fold
      duplication outweighs two extra exchanges).
    """
    import ray
    import ray.data

    if verify == "auto":
        sample = docs_ds.limit(256).to_pandas()
        if len(sample):
            avg_bytes = float(
                np.mean(
                    [
                        8 * len(np.unique(_shingles(t, k) & np.uint64(0xFFFFFFFF)))
                        for t in sample["text"].fillna("")
                    ]
                )
            )
        else:
            avg_bytes = 0.0
        verify = "join" if avg_bytes >= 512.0 else "carry"

    band_rows = minhash_band_rows(
        docs_ds, num_perm, bands, k, seed, carry_shingles=(verify == "carry")
    ).materialize()

    if band_rows.count() == 0:
        # entirely-empty join sides crash Ray 2.49 shuffles (compat.py)
        return docs_ds.select_columns(["doc_id"]).map_batches(
            lambda t: pa.table({"doc_id": t["doc_id"], "dup_group": t["doc_id"]}),
            batch_format="pyarrow",
            zero_copy_batch=True,
        )

    if verify == "join":
        cands = candidate_pairs(band_rows, num_partitions).materialize()
        if cands.count() == 0:
            return docs_ds.select_columns(["doc_id"]).map_batches(
                lambda t: pa.table(
                    {"doc_id": t["doc_id"], "dup_group": t["doc_id"]}
                ),
                batch_format="pyarrow",
                zero_copy_batch=True,
            )
        shing = doc_shingles(docs_ds, k).materialize()
        j = cands.join(
            shing, join_type="inner", num_partitions=num_partitions,
            on=("a",), right_on=("sid",),
        )
        j = j.map_batches(
            lambda t: pa.table({"a": t["a"], "b": t["b"], "toks_a": t["toks"]}),
            batch_format="pyarrow",
            zero_copy_batch=True,
        ).join(
            shing, join_type="inner", num_partitions=num_partitions,
            on=("b",), right_on=("sid",),
        )

        def jverify(t: pa.Table) -> pa.Table:
            a = t["a"].combine_chunks().to_numpy(zero_copy_only=False)
            b = t["b"].combine_chunks().to_numpy(zero_copy_only=False)
            ta = t["toks_a"].combine_chunks()
            tb = t["toks"].combine_chunks()
            ka, kb = [], []
            for i in range(len(a)):
                sa = np.frombuffer(ta[i].as_py(), dtype=np.int64)
                sb = np.frombuffer(tb[i].as_py(), dtype=np.int64)
                inter = len(np.intersect1d(sa, sb, assume_unique=True))
                union = len(sa) + len(sb) - inter
                if (inter / union if union else 1.0) >= threshold:
                    ka.append(int(a[i]))
                    kb.append(int(b[i]))
            return pa.table(
                {
                    "a": np.array(ka, dtype=np.int64),
                    "b": np.array(kb, dtype=np.int64),
                }
            )

        verified = j.map_batches(
            jverify, batch_format="pyarrow", zero_copy_batch=True
        ).materialize()
        return _dup_groups_from_verified(
            docs_ds, verified, num_partitions, driver_pair_limit
        )

    joined = band_rows.join(
        band_rows,
        join_type="inner",
        num_partitions=num_partitions,
        on=("band", "band_hash"),
        left_suffix="_l",
        right_suffix="_r",
    )

    def verify(t: pa.Table) -> pa.Table:
        a = t["doc_id_l"].combine_chunks().to_numpy(zero_copy_only=False)
        b = t["doc_id_r"].combine_chunks().to_numpy(zero_copy_only=False)
        keep = np.flatnonzero(a < b)
        if len(keep) == 0:
            return pa.table(
                {"a": pa.array([], pa.int64()), "b": pa.array([], pa.int64())}
            )
        # local pre-dedup: the same pair can collide via multiple bands
        order = np.lexsort((b[keep], a[keep]))
        ks = keep[order]
        aa, bb = a[ks], b[ks]
        first = np.ones(len(ks), dtype=bool)
        first[1:] = (aa[1:] != aa[:-1]) | (bb[1:] != bb[:-1])
        keep = ks[first]
        toks_l = t["toks_l"].combine_chunks()
        toks_r = t["toks_r"].combine_chunks()
        ka, kb = [], []
        for i in keep:
            i = int(i)
            sa = np.frombuffer(toks_l[i].as_py(), dtype=np.int64)
            sb = np.frombuffer(toks_r[i].as_py(), dtype=np.int64)
            inter = len(np.intersect1d(sa, sb, assume_unique=True))
            union = len(sa) + len(sb) - inter
            if (inter / union if union else 1.0) >= threshold:
                ka.append(int(a[i]))
                kb.append(int(b[i]))
        return pa.table(
            {
                "a": np.array(ka, dtype=np.int64),
                "b": np.array(kb, dtype=np.int64),
            }
        )

    verified = joined.map_batches(
        verify, batch_format="pyarrow", zero_copy_batch=True
    ).materialize()
    return _dup_groups_from_verified(
        docs_ds, verified, num_partitions, driver_pair_limit
    )


def _dup_groups_from_verified(docs_ds, verified, num_partitions, driver_pair_limit):
    """Verified duplicate pairs -> (doc_id, dup_group) for every doc.

    On a high-duplication web corpus verified pairs are O(n_docs), so the
    component solve must stay distributed.  resolve_equivalence_pairs
    routes small sets to one vectorized driver pass (broadcast root map
    below) and large sets through the large-star/small-star contraction —
    never a per-pair driver loop."""
    import ray

    from networkit_ray.pipelines.equivalence import resolve_equivalence_pairs

    n_verified = verified.count()
    if n_verified <= driver_pair_limit:
        roots_ds = resolve_equivalence_pairs(
            verified,
            num_partitions=num_partitions,
            driver_pair_limit=driver_pair_limit,
        )
        tbl = roots_ds.to_pandas()  # bounded by driver_pair_limit
        vids = tbl["vid"].to_numpy(np.int64)
        roots = tbl["label"].to_numpy(np.int64)
        order = np.argsort(vids)
        ref = ray.put((vids[order], roots[order]))

        def assign(t: pa.Table, _ref=ref) -> pa.Table:
            v, r = ray.get(_ref)  # plasma broadcast, zero-copy per task
            ids = t["doc_id"].combine_chunks().to_numpy(zero_copy_only=False)
            if len(v) == 0:
                return pa.table({"doc_id": ids, "dup_group": ids})
            pos = np.minimum(np.searchsorted(v, ids), len(v) - 1)
            grp = np.where(v[pos] == ids, r[pos], ids)
            return pa.table({"doc_id": ids, "dup_group": grp})

        return docs_ds.select_columns(["doc_id"]).map_batches(
            assign, batch_format="pyarrow", zero_copy_batch=True
        )

    # large verified set: distributed star contraction + co-partitioned join
    roots_ds = resolve_equivalence_pairs(
        verified, num_partitions=num_partitions, driver_pair_limit=driver_pair_limit
    ).materialize()
    roots_ds = roots_ds.map_batches(
        lambda t: pa.table({"doc_id": t["vid"], "dup_group": t["label"]}),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )
    return (
        docs_ds.select_columns(["doc_id"])
        .join(
            roots_ds,
            join_type="left_outer",
            num_partitions=num_partitions,
            on=("doc_id",),
        )
        .map_batches(
            lambda t: pa.table(
                {
                    "doc_id": t["doc_id"],
                    "dup_group": pc.coalesce(t["dup_group"], t["doc_id"]),
                }
            ),
            batch_format="pyarrow",
            zero_copy_batch=True,
        )
    )


# ---- SimHash --------------------------------------------------------------


def simhash_batch(texts) -> np.ndarray:
    """Charikar simhash of a whole batch of documents, uint64 per doc —
    ONE token-hash pass over the concatenated token stream and ONE
    reduceat-segmented bit tally for the entire batch (the per-doc Python
    loop is only the unavoidable str.split)."""
    n = len(texts)
    out = np.zeros(n, dtype=np.uint64)
    toks = [(t or "").split() for t in texts]
    lens = np.fromiter((len(x) for x in toks), dtype=np.int64, count=n)
    nz = np.flatnonzero(lens)
    if len(nz) == 0:
        return out
    flat = [w for i in nz for w in toks[i]]
    th = _token_hashes(flat)
    shifts = np.arange(64, dtype=np.uint64)
    starts = np.zeros(len(nz), dtype=np.int64)
    nzlens = lens[nz]
    np.cumsum(nzlens[:-1], out=starts[1:])
    # per-bit streaming tally (64 cache-friendly passes over the token
    # stream beats one (tokens x 64) matrix, which thrashes cache at
    # realistic batch sizes); bit set <=> ones > len/2, ties -> 0, exactly
    # the sign of the +-1 tally
    counts = np.empty((len(nz), 64), dtype=np.int64)
    for b in shifts:
        counts[:, int(b)] = np.add.reduceat(
            ((th >> b) & np.uint64(1)).astype(np.int64), starts
        )
    out[nz] = ((2 * counts > nzlens[:, None]).astype(np.uint64) << shifts[None, :]).sum(
        axis=1, dtype=np.uint64
    )
    return out


def simhash64(text: str) -> int:
    return int(simhash_batch([text])[0])


def simhash_signatures(docs_ds):
    def mk(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "doc_id": df["doc_id"].to_numpy(np.int64),
                "simhash": simhash_batch(df["text"].fillna("").tolist()).view(
                    np.int64
                ),
            }
        )

    return docs_ds.map_batches(mk, batch_format="pandas")


def _popcount64(x: np.ndarray) -> np.ndarray:
    """Vectorized popcount of an int64-viewed uint64 array."""
    u = x.view(np.uint64)
    d = np.zeros(len(u), dtype=np.int64)
    for i in range(64):
        d += ((u >> np.uint64(i)) & np.uint64(1)).astype(np.int64)
    return d


def simhash_candidates(
    docs_ds, num_partitions=8, max_bucket=10_000, skew_log=None
):
    """Candidate *signature* pairs (sa, sb, hamming) over DISTINCT simhash
    values: band each distinct 64-bit signature into 4x16-bit keys and
    self-join buckets (any pair at Hamming distance <= 3 shares a band by
    pigeonhole).

    Skew safety (the triangles-hub-cap analogue): operating on distinct
    signatures collapses the classic degenerate bucket — a million
    identical/templated docs are ONE signature here, not 10^12 pairs — and
    residual hot buckets with > ``max_bucket`` distinct signatures are
    dropped and counted in ``skew_log`` (a dict, if given), mirroring how a
    real corpus run would quarantine pathological template clusters rather
    than melt a single task.
    """
    sigs = simhash_signatures(docs_ds)

    distinct = (
        sigs.groupby("simhash", num_partitions=num_partitions)
        .count()
        .select_columns(["simhash"])
    )

    def explode(df: pd.DataFrame) -> pd.DataFrame:
        sh = df["simhash"].to_numpy(np.int64).view(np.uint64)
        rows = []
        for band in range(4):
            chunk = ((sh >> np.uint64(band * 16)) & np.uint64(0xFFFF)).astype(np.int64)
            rows.append(
                pd.DataFrame(
                    {"band": band, "band_hash": chunk, "simhash": sh.view(np.int64)}
                )
            )
        return pd.concat(rows, ignore_index=True)

    band_rows = distinct.map_batches(explode, batch_format="pandas").materialize()

    # hot-bucket quarantine: buckets wider than max_bucket distinct sigs
    sizes = (
        band_rows.groupby(["band", "band_hash"], num_partitions=num_partitions)
        .count()
    )
    hot = sizes.map_batches(
        lambda t: t.filter(pc.greater(t["count()"], max_bucket)),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )
    hot_pdf = hot.to_pandas()  # tiny by construction (hot buckets only)
    if len(hot_pdf):
        if skew_log is not None:
            skew_log["hot_buckets"] = len(hot_pdf)
            skew_log["hot_bucket_sigs"] = int(hot_pdf["count()"].sum())
        hot_keys = set(
            zip(hot_pdf["band"].astype(int), hot_pdf["band_hash"].astype(int))
        )
        import ray

        hot_ref = ray.put(hot_keys)

        def drop_hot(t: pa.Table) -> pa.Table:
            import ray as _ray

            keys = _ray.get(hot_ref)
            b = t["band"].combine_chunks().to_numpy(zero_copy_only=False)
            h = t["band_hash"].combine_chunks().to_numpy(zero_copy_only=False)
            keep = np.array(
                [(int(x), int(y)) not in keys for x, y in zip(b, h)], dtype=bool
            )
            return t.filter(pa.array(keep))

        band_rows = band_rows.map_batches(
            drop_hot, batch_format="pyarrow", zero_copy_batch=True
        ).materialize()

    joined = band_rows.join(
        band_rows,
        join_type="inner",
        num_partitions=num_partitions,
        on=("band", "band_hash"),
        left_suffix="_l",
        right_suffix="_r",
    )

    def mk_pairs(t: pa.Table) -> pa.Table:
        sa = t["simhash_l"].combine_chunks().to_numpy(zero_copy_only=False)
        sb = t["simhash_r"].combine_chunks().to_numpy(zero_copy_only=False)
        keep = sa < sb
        out = pa.table({"sa": sa[keep], "sb": sb[keep]})
        return out.group_by(["sa", "sb"]).aggregate([])  # local pre-dedup

    pairs = joined.map_batches(mk_pairs, batch_format="pyarrow", zero_copy_batch=True)
    deduped = (
        pairs.groupby(["sa", "sb"], num_partitions=num_partitions)
        .count()
        .select_columns(["sa", "sb"])
    )

    def ham(t: pa.Table) -> pa.Table:
        sa = t["sa"].combine_chunks().to_numpy(zero_copy_only=False)
        sb = t["sb"].combine_chunks().to_numpy(zero_copy_only=False)
        return pa.table({"sa": sa, "sb": sb, "hamming": _popcount64(sa ^ sb)})

    return deduped.map_batches(ham, batch_format="pyarrow", zero_copy_batch=True)


def simhash_near_dups(
    docs_ds, max_hamming=3, num_partitions=8, max_bucket=10_000, skew_log=None
):
    """-> Dataset(a, b, hamming): doc pairs with signature Hamming distance
    <= max_hamming.  Candidates are generated over distinct signatures
    (skew-safe, see simhash_candidates) and expanded back to doc pairs via
    two co-partitioned joins on the signature; identical-signature groups
    expand to their (output-bound) hamming-0 member pairs."""
    sigs = simhash_signatures(docs_ds).materialize()
    if sigs.count() == 0:
        return _empty_sim_pairs_ds()

    cand = (
        simhash_candidates(docs_ds, num_partitions, max_bucket, skew_log)
        .map_batches(
            lambda t: t.filter(pc.less_equal(t["hamming"], max_hamming)),
            batch_format="pyarrow",
            zero_copy_batch=True,
        )
        .materialize()
    )

    # identical-signature pairs (hamming 0): self-join members on simhash
    within = sigs.join(
        sigs,
        join_type="inner",
        num_partitions=num_partitions,
        on=("simhash",),
        left_suffix="_l",
        right_suffix="_r",
    ).map_batches(
        lambda t: pa.table(
            {
                "a": pc.if_else(
                    pc.less(t["doc_id_l"], t["doc_id_r"]), t["doc_id_l"], t["doc_id_r"]
                ),
                "b": pc.if_else(
                    pc.less(t["doc_id_l"], t["doc_id_r"]), t["doc_id_r"], t["doc_id_l"]
                ),
                "hamming": pa.array(np.zeros(t.num_rows, dtype=np.int64)),
            }
        ).filter(pc.less(t["doc_id_l"], t["doc_id_r"])),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )

    if cand.count() == 0:
        return within

    # cross-signature expansion: (sa, sb, hamming) x members(sa) x members(sb)
    j1 = cand.join(
        sigs,
        join_type="inner",
        num_partitions=num_partitions,
        on=("sa",),
        right_on=("simhash",),
    ).map_batches(
        lambda t: pa.table(
            {"sb": t["sb"], "hamming": t["hamming"], "da": t["doc_id"]}
        ),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )
    cross = j1.join(
        sigs,
        join_type="inner",
        num_partitions=num_partitions,
        on=("sb",),
        right_on=("simhash",),
    ).map_batches(
        lambda t: pa.table(
            {
                "a": pc.min_element_wise(t["da"], t["doc_id"]),
                "b": pc.max_element_wise(t["da"], t["doc_id"]),
                "hamming": t["hamming"],
            }
        ),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )
    return within.union(cross)


def _empty_sim_pairs_ds():
    import ray.data

    return ray.data.from_arrow(
        pa.table(
            {
                "a": pa.array([], pa.int64()),
                "b": pa.array([], pa.int64()),
                "hamming": pa.array([], pa.int64()),
            }
        )
    )


# ---- exact distributed token Jaccard (prefix-filtered set-similarity join)


def _token_set_rows(docs_ds, concurrency=4):
    """documents -> (doc_id, toks: large_binary of the sorted distinct
    token-hash set, sz).  Empty docs are dropped (matching the SQL oracle's
    TRIM(text) <> '' filter).  64-bit token hashing makes distinct-word
    Jaccard exact up to a ~2^-64 per-pair collision probability."""

    def mk(df: pd.DataFrame) -> pa.Table:
        ids = df["doc_id"].to_numpy(np.int64)
        out_ids, blobs, szs = [], [], []
        for i, t in zip(ids, df["text"].fillna("")):
            toks = t.split()
            if not toks:
                continue
            hs = np.unique(pd.util.hash_array(np.asarray(toks, dtype=object)))
            out_ids.append(int(i))
            blobs.append(hs.view(np.int64).tobytes())
            szs.append(len(hs))
        return pa.table(
            {
                "doc_id": np.array(out_ids, dtype=np.int64),
                "toks": pa.array(blobs, type=pa.large_binary()),
                "sz": np.array(szs, dtype=np.int64),
            }
        )

    return docs_ds.select_columns(["doc_id", "text"]).map_batches(
        mk, batch_format="pandas", concurrency=concurrency, num_cpus=0.5
    )


_HOT_BASE = np.uint64(1) << np.uint64(63)


def jaccard_similar_pairs(
    docs_ds, threshold=0.5, num_partitions=8, hot_k=4096
):
    """Exact all-pairs Jaccard over distinct-word sets -> (a, b, jaccard)
    for every pair with jaccard >= threshold, a < b.

    Distributed prefix-filtered set-similarity join (SSJoin/PPJoin family,
    Chaudhuri et al. ICDE'06 / Xiao et al. WWW'08):

    1. token-set stage: per doc the sorted distinct token-hash set.
    2. global token order: ascending document frequency — the ``hot_k``
       most frequent tokens (one pre-combined count + small sort) rank
       LAST; all other tokens order by hash.  Hot-token posting lists
       therefore never enter prefixes, bounding the self-join's skew.
    3. prefix stage: each doc emits its floor((1-t)·sz)+1 smallest tokens
       under that order.  Theorem: any pair with J >= t shares at least
       one prefix token, so candidate generation is EXACT (no recall loss).
    4. candidate pairs: vectorized self-join on the prefix token, a < b,
       deduped.
    5. verify: two co-partitioned joins attach both docs' full token sets
       (binary payload, never raw text); exact Jaccard computed inline.

    Every stage is a linear shuffle; nothing corpus-sized ever reaches the
    driver (the hot-token table is hot_k rows).
    """
    docsets = _token_set_rows(docs_ds).materialize()
    if docsets.count() == 0:
        return _empty_pairs_ds()

    # -- global token order: hot tokens (by document frequency) rank last
    def tok_counts(t: pa.Table) -> pa.Table:
        toks = t["toks"].combine_chunks()
        vals = [np.frombuffer(toks[i].as_py(), dtype=np.int64) for i in range(len(toks))]
        allv = np.concatenate(vals) if vals else np.empty(0, np.int64)
        u, c = np.unique(allv, return_counts=True)
        return pa.table({"tok": u, "n": c})

    from ray.data.aggregate import Sum

    counts = (
        docsets.map_batches(tok_counts, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("tok", num_partitions=num_partitions)
        .aggregate(Sum("n", alias_name="n"))
    )
    hot_tbl = (
        counts.sort(["n", "tok"], descending=[True, False]).limit(hot_k).to_pandas()
    )
    # rank hot tokens ascending by (freq, hash) so the global order stays
    # total and deterministic; rank 0 sorts first among hot
    hot_tbl = hot_tbl.sort_values(["n", "tok"], ascending=[True, True])
    hot_hashes = hot_tbl["tok"].to_numpy(np.int64)
    hot_sorted_idx = np.argsort(hot_hashes)
    hot_sorted = hot_hashes[hot_sorted_idx]
    hot_rank_of_sorted = np.empty(len(hot_hashes), dtype=np.uint64)
    hot_rank_of_sorted[hot_sorted_idx] = np.arange(len(hot_hashes), dtype=np.uint64)

    import ray

    hot_ref = ray.put((hot_sorted, hot_rank_of_sorted))

    class PrefixRows:
        def __init__(self, hot_ref, threshold):
            self.hot, self.hot_rank = ray.get(hot_ref)
            self.t = threshold

        def __call__(self, t: pa.Table) -> pa.Table:
            ids = t["doc_id"].combine_chunks().to_numpy(zero_copy_only=False)
            toks = t["toks"].combine_chunks()
            out_tok, out_id = [], []
            for i in range(len(ids)):
                hs = np.frombuffer(toks[i].as_py(), dtype=np.int64)
                u = hs.view(np.uint64)
                # order keys, compared in uint64 space: non-hot = hash>>1
                # (< 2^63), hot = 2^63 + rank (sorts after every non-hot)
                keys = u >> np.uint64(1)
                pos = np.searchsorted(self.hot, hs)
                pos_c = np.minimum(pos, max(len(self.hot) - 1, 0))
                is_hot = (len(self.hot) > 0) & (self.hot[pos_c] == hs)
                if is_hot.any():
                    keys = keys.copy()
                    keys[is_hot] = _HOT_BASE + self.hot_rank[pos_c[is_hot]]
                sz = len(hs)
                p = min(int((1.0 - self.t) * sz + 1e-9) + 1, sz)
                pref = np.argpartition(keys, p - 1)[:p] if p < sz else np.arange(sz)
                out_tok.append(keys[pref].view(np.int64))
                out_id.append(np.full(p, ids[i], dtype=np.int64))
            if not out_tok:
                return pa.table(
                    {"tok": pa.array([], pa.int64()), "doc_id": pa.array([], pa.int64())}
                )
            return pa.table(
                {"tok": np.concatenate(out_tok), "doc_id": np.concatenate(out_id)}
            )

    prefix = docsets.map_batches(
        PrefixRows,
        fn_constructor_kwargs={"hot_ref": hot_ref, "threshold": threshold},
        batch_format="pyarrow",
        zero_copy_batch=True,
        concurrency=4,
        num_cpus=0.5,
    ).materialize()

    joined = prefix.join(
        prefix,
        join_type="inner",
        num_partitions=num_partitions,
        on=("tok",),
        left_suffix="_l",
        right_suffix="_r",
    )

    def mk_pairs(t: pa.Table) -> pa.Table:
        a = t["doc_id_l"].combine_chunks().to_numpy(zero_copy_only=False)
        b = t["doc_id_r"].combine_chunks().to_numpy(zero_copy_only=False)
        keep = a < b
        out = pa.table({"a": a[keep], "b": b[keep]})
        return out.group_by(["a", "b"]).aggregate([])  # local pre-dedup

    cands = (
        joined.map_batches(mk_pairs, batch_format="pyarrow", zero_copy_batch=True)
        .groupby(["a", "b"], num_partitions=num_partitions)
        .count()
        .select_columns(["a", "b"])
        .materialize()
    )
    if cands.count() == 0:
        return _empty_pairs_ds()

    # -- verify: attach both token sets via co-partitioned joins (binary
    # payload; candidate volume is prefix-bounded, not n²)
    j1 = cands.join(
        docsets,
        join_type="inner",
        num_partitions=num_partitions,
        on=("a",),
        right_on=("doc_id",),
    ).map_batches(
        lambda t: pa.table({"a": t["a"], "b": t["b"], "toks_a": t["toks"]}),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )
    j2 = j1.join(
        docsets,
        join_type="inner",
        num_partitions=num_partitions,
        on=("b",),
        right_on=("doc_id",),
    ).map_batches(
        lambda t: pa.table(
            {"a": t["a"], "b": t["b"], "toks_a": t["toks_a"], "toks_b": t["toks"]}
        ),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )

    def verify(t: pa.Table) -> pa.Table:
        a = t["a"].combine_chunks().to_numpy(zero_copy_only=False)
        b = t["b"].combine_chunks().to_numpy(zero_copy_only=False)
        ta = t["toks_a"].combine_chunks()
        tb = t["toks_b"].combine_chunks()
        ka, kb, jac = [], [], []
        for i in range(len(a)):
            sa = np.frombuffer(ta[i].as_py(), dtype=np.int64)
            sb = np.frombuffer(tb[i].as_py(), dtype=np.int64)
            inter = len(np.intersect1d(sa, sb, assume_unique=True))
            union = len(sa) + len(sb) - inter
            j = inter / union if union else 1.0
            if j >= threshold:
                ka.append(int(a[i]))
                kb.append(int(b[i]))
                jac.append(j)
        return pa.table(
            {
                "a": np.array(ka, dtype=np.int64),
                "b": np.array(kb, dtype=np.int64),
                "jaccard": np.array(jac, dtype=np.float64),
            }
        )

    return j2.map_batches(verify, batch_format="pyarrow", zero_copy_batch=True)


def _empty_pairs_ds():
    import ray.data

    return ray.data.from_arrow(
        pa.table(
            {
                "a": pa.array([], pa.int64()),
                "b": pa.array([], pa.int64()),
                "jaccard": pa.array([], pa.float64()),
            }
        )
    )
