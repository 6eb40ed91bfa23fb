"""Unit layer (FIXTURES.md §5.2.1): extractor on hand-written corpus rows,
sha256 oracle via hashlib, generator determinism."""

import hashlib

import pyarrow as pa
import pytest

from networkit_ray.sources import corpus as corpus_mod
from networkit_ray.stages.extract import extract_edge_keys, extract_edges
from networkit_ray.stages.sha256 import add_sha256, with_sha256

HAND_ROWS = [
    # py: one cross-repo import + one sibling import
    {
        "repo": "orgA/app",
        "path": "src/m0/f0.py",
        "commit": "c" * 40,
        "lang": "py",
        "content": "// hdr\nimport orgB.lib\nfrom . import src.m0.f1\n// filler",
    },
    # js
    {
        "repo": "orgA/app",
        "path": "src/m0/f1.js",
        "commit": "c" * 40,
        "lang": "js",
        "content": 'const d0 = require("orgC/util");\nconst r1 = require("./src/m0/f2.js");',
    },
    # go
    {
        "repo": "orgB/lib",
        "path": "src/m0/f0.go",
        "commit": "d" * 40,
        "lang": "go",
        "content": 'import "orgA/app"\nimport "./src/m1/f10.go"',
    },
    # java
    {
        "repo": "orgC/util",
        "path": "src/m0/f0.java",
        "commit": "e" * 40,
        "lang": "java",
        "content": "import orgA.app;\nimport self.src.m0.f3;\n// x",
    },
    # rs
    {
        "repo": "orgD/rs",
        "path": "src/m0/f0.rs",
        "commit": "f" * 40,
        "lang": "rs",
        "content": "use orgA::app;\nuse crate::src::m0::f9;",
    },
    # duplicate + self import on purpose
    {
        "repo": "orgA/app",
        "path": "src/m0/f2.py",
        "commit": "c" * 40,
        "lang": "py",
        "content": "import orgB.lib\nimport orgB.lib\nimport orgA.app",
    },
]

EXPECTED_REPO_EDGES = [
    ("orgA/app", "orgB/lib"),
    ("orgA/app", "orgC/util"),
    ("orgB/lib", "orgA/app"),
    ("orgC/util", "orgA/app"),
    ("orgD/rs", "orgA/app"),
    ("orgA/app", "orgB/lib"),
    ("orgA/app", "orgB/lib"),
    ("orgA/app", "orgA/app"),
]

EXPECTED_FILE_EDGES = [
    ("orgA/app:src/m0/f0.py", "orgA/app:src/m0/f1.py"),
    ("orgA/app:src/m0/f1.js", "orgA/app:src/m0/f2.js"),
    ("orgB/lib:src/m0/f0.go", "orgB/lib:src/m1/f10.go"),
    ("orgC/util:src/m0/f0.java", "orgC/util:src/m0/f3.java"),
    ("orgD/rs:src/m0/f0.rs", "orgD/rs:src/m0/f9.rs"),
]


def hand_table():
    return pa.Table.from_pylist(HAND_ROWS)


def test_extract_hand_written_exact():
    out = extract_edge_keys(hand_table())
    repo_edges = sorted(
        (s, d)
        for s, d, lv in zip(
            out["src_key"].to_pylist(), out["dst_key"].to_pylist(), out["level"].to_pylist()
        )
        if lv == "repo"
    )
    file_edges = sorted(
        (s, d)
        for s, d, lv in zip(
            out["src_key"].to_pylist(), out["dst_key"].to_pylist(), out["level"].to_pylist()
        )
        if lv == "file"
    )
    assert repo_edges == sorted(EXPECTED_REPO_EDGES)
    assert file_edges == sorted(EXPECTED_FILE_EDGES)


def test_sha256_matches_hashlib_oracle():
    t = add_sha256(hand_table())
    for row in t.to_pylist():
        assert row["sha256"] == hashlib.sha256(row["content"].encode()).hexdigest()


def test_generator_deterministic_and_batch_invariant():
    a = corpus_mod.corpus_table(num_repos=20, seed=42)
    b = corpus_mod.corpus_table(num_repos=20, seed=42)
    assert a.equals(b)
    c = corpus_mod.corpus_table(num_repos=20, seed=7)
    assert not a.equals(c)
    # per-repo rows independent of which chunk generates them
    rows_direct = corpus_mod.generate_repo_rows(5, 20, 42)
    sub = a.filter(pa.compute.equal(a["repo"], corpus_mod.repo_name(5)))
    assert sub.to_pylist() == rows_direct


def test_generated_corpus_roundtrips_through_extractor():
    """Every import line the generator writes must be recovered exactly."""
    t = corpus_mod.corpus_table(num_repos=30, seed=42)
    out = extract_edge_keys(t)
    assert out.num_rows > 0
    repos = {corpus_mod.repo_name(i) for i in range(30)}
    for s, d, lv in zip(
        out["src_key"].to_pylist(), out["dst_key"].to_pylist(), out["level"].to_pylist()
    ):
        if lv == "repo":
            assert s in repos and d in repos
        else:
            sr, sp = s.split(":", 1)
            dr, dp = d.split(":", 1)
            assert sr == dr and sr in repos
            assert sp.startswith("src/") and dp.startswith("src/")


def test_extract_edges_dataset_and_sha_pipeline(ray_session):
    import ray.data

    ds = ray.data.from_arrow(hand_table())
    ds = with_sha256(ds)
    edges = extract_edges(ds, level="repo")
    rows = edges.take_all()
    assert sorted((r["src_key"], r["dst_key"]) for r in rows) == sorted(
        EXPECTED_REPO_EDGES
    )


def test_distributed_generation_matches_local(ray_session):
    ds = corpus_mod.corpus_dataset(num_repos=20, seed=42, parallelism=4)
    got = ds.to_pandas().sort_values(["repo", "path"]).reset_index(drop=True)
    want = (
        corpus_mod.corpus_table(num_repos=20, seed=42)
        .to_pandas()
        .sort_values(["repo", "path"])
        .reset_index(drop=True)
    )
    assert got.equals(want)
