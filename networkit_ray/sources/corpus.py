"""Deterministic synthetic source-code corpus (the input-hint table shape).

Schema (BASELINE.json:15): repo:string, path:string, commit:string,
lang:string, content:string.  The reference corpus is unavailable
(/root/reference is empty — SURVEY.md §0), so this generator is the in-repo
source of truth for engine inputs, per FIXTURES.md §1:

- ``num_repos`` repos; cross-repo import targets drawn Zipf(a=1.3) over repo
  rank (hub skew, exercises skew handling).
- Files per repo ~ LogNormal(mu=1.5, sigma=1.0) clipped to [1, 200].
- Each file holds k ~ Geometric(0.3) import statements; ~70% cross-repo
  (repo-level edges), ~30% sibling-file relative imports (file-level edges).
  Self-imports and duplicate imports occur on purpose (dedup tests).

Determinism: every row depends only on (seed, repo_index) via
``numpy.random.Generator(PCG64([seed, repo_index]))`` so generation is
identical regardless of how repo indices are batched across Ray tasks.

Edge-derivation grammar (the extractor contract, see stages/extract.py):

cross-repo import of repo "org042/repo00017" (one '/' in every repo name):
    py    import org042.repo00017
    js    const d3 = require("org042/repo00017");
    go    import "org042/repo00017"
    java  import org042.repo00017;
    rs    use org042::repo00017;

intra-repo relative import of sibling file "src/m1/f12.py" (stem = path
without extension; '/' -> '.' for py/java, '::' for rs; js/go keep the path):
    py    from . import src.m1.f12
    js    const r4 = require("./src/m1/f12.js");
    go    import "./src/m1/f12.go"
    java  import self.src.m1.f12;
    rs    use crate::src::m1::f12;
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

LANGS = ["py", "js", "go", "java", "rs"]
ZIPF_A = 1.3

_FILLER_WORDS = [
    "buffer", "stream", "graph", "vector", "index", "shard", "batch",
    "merge", "parse", "token", "cache", "queue", "block", "frame",
]


def repo_name(i: int) -> str:
    return f"org{i % 97:03d}/repo{i:05d}"


def _cross_import_line(lang: str, target_repo: str, j: int) -> str:
    if lang == "py":
        return f"import {target_repo.replace('/', '.')}"
    if lang == "js":
        return f'const d{j} = require("{target_repo}");'
    if lang == "go":
        return f'import "{target_repo}"'
    if lang == "java":
        return f"import {target_repo.replace('/', '.')};"
    return f"use {target_repo.replace('/', '::')};"  # rs


def _sibling_import_line(lang: str, sibling_path: str, j: int) -> str:
    stem = sibling_path.rsplit(".", 1)[0]
    if lang == "py":
        return f"from . import {stem.replace('/', '.')}"
    if lang == "js":
        return f'const r{j} = require("./{sibling_path}");'
    if lang == "go":
        return f'import "./{sibling_path}"'
    if lang == "java":
        return f"import self.{stem.replace('/', '.')};"
    return f"use crate::{stem.replace('/', '::')};"  # rs


def _zipf_target(rng: np.random.Generator, num_repos: int) -> int:
    """Zipf(ZIPF_A)-distributed repo index in [0, num_repos) by rejection."""
    while True:
        x = int(rng.zipf(ZIPF_A))
        if x <= num_repos:
            return x - 1


def generate_repo_rows(repo_idx: int, num_repos: int, seed: int) -> list[dict]:
    """All corpus rows for one repo — pure function of (seed, repo_idx)."""
    rng = np.random.default_rng([seed, repo_idx])
    repo = repo_name(repo_idx)
    lang = LANGS[int(rng.integers(len(LANGS)))]
    commit = bytes(rng.integers(0, 256, size=20, dtype=np.uint8)).hex()
    n_files = int(np.clip(np.round(rng.lognormal(1.5, 1.0)), 1, 200))
    paths = [f"src/m{j // 10}/f{j}.{lang}" for j in range(n_files)]
    rows = []
    for j, path in enumerate(paths):
        k = int(rng.geometric(0.3))
        lines = [f"// {repo}:{path} generated corpus file"]
        for imp in range(k):
            if rng.random() < 0.7:
                target = repo_name(_zipf_target(rng, num_repos))
                lines.append(_cross_import_line(lang, target, imp))
            else:
                sib = paths[int(rng.integers(n_files))]
                lines.append(_sibling_import_line(lang, sib, imp))
        n_fill = int(rng.integers(1, 6))
        words = rng.choice(_FILLER_WORDS, size=4 * n_fill)
        for f in range(n_fill):
            lines.append("// " + " ".join(words[4 * f : 4 * f + 4]))
        rows.append(
            {
                "repo": repo,
                "path": path,
                "commit": commit,
                "lang": lang,
                "content": "\n".join(lines),
            }
        )
    return rows


def _rows_table(rows: list[dict]) -> pa.Table:
    schema = pa.schema(
        [
            ("repo", pa.string()),
            ("path", pa.string()),
            ("commit", pa.string()),
            ("lang", pa.string()),
            ("content", pa.string()),
        ]
    )
    return pa.Table.from_pylist(rows, schema=schema)


def corpus_table(num_repos: int, seed: int = 42) -> pa.Table:
    """Whole corpus as one Arrow table — tests / tiny corpora only."""
    rows: list[dict] = []
    for i in range(num_repos):
        rows.extend(generate_repo_rows(i, num_repos, seed))
    return _rows_table(rows)


def corpus_dataset(num_repos: int, seed: int = 42, parallelism: int = 16):
    """Distributed generation: one Ray task per chunk of repo indices.

    Scales to arbitrarily many repos — no driver-side materialization; each
    map task generates only its repo range (deterministic per repo).
    """
    import ray.data

    ds = ray.data.range(num_repos, override_num_blocks=parallelism)

    def gen(batch: pa.Table) -> pa.Table:
        rows: list[dict] = []
        for i in batch["id"].to_pylist():
            rows.extend(generate_repo_rows(int(i), num_repos, seed))
        return _rows_table(rows)

    return ds.map_batches(gen, batch_format="pyarrow")


def write_corpus(path: str, num_repos: int, seed: int = 42, parallelism: int = 16):
    corpus_dataset(num_repos, seed, parallelism).write_parquet(path)


def read_corpus(path: str, columns: list[str] | None = None):
    import ray.data

    return ray.data.read_parquet(path, columns=columns)
