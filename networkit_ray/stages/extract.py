"""Edge extraction from corpus content — lang-dispatched regex extractors.

Implements the north-star extraction step (BASELINE.json:6): "edges =
repo-path/import/dependency links extracted via map_batches over zero-copy
Arrow".  The grammar being parsed is pinned in sources/corpus.py's module
docstring; extractors are *text* parsers (regex over ``content``), not
metadata lookups, so they work on any corpus matching the grammar.

Two edge levels (FIXTURES.md §1):
  repo level:  src_key = repo,            dst_key = imported repo
  file level:  src_key = "repo:path",     dst_key = "repo:sibling_path"

The extractor registry is the user-extension surface (SURVEY.md §2.2): map
``lang -> (cross_regex, sibling_regex, decoders)``; registering a new
language is one dict entry.
"""

from __future__ import annotations

import re

import pyarrow as pa

EDGE_KEY_SCHEMA = pa.schema(
    [
        ("src_key", pa.string()),
        ("dst_key", pa.string()),
        ("level", pa.string()),
    ]
)


def _dots_to_repo(tok: str) -> str:
    return tok.replace(".", "/", 1)


def _ident(tok: str) -> str:
    return tok


def _rs_to_repo(tok: str) -> str:
    return tok.replace("::", "/", 1)


def _stem_dots_to_path(stem: str, ext: str) -> str:
    return stem.replace(".", "/") + "." + ext


def _relpath_to_path(rel: str, ext: str) -> str:
    return rel


def _stem_cc_to_path(stem: str, ext: str) -> str:
    return stem.replace("::", "/") + "." + ext


# lang -> (cross-repo regex, cross decoder, sibling regex, sibling decoder)
EXTRACTORS: dict[str, tuple] = {
    "py": (
        re.compile(r"^import ([\w.]+)$", re.M),
        _dots_to_repo,
        re.compile(r"^from \. import ([\w.]+)$", re.M),
        _stem_dots_to_path,
    ),
    "js": (
        re.compile(r'require\("([^"./][^"]*)"\)', re.M),
        _ident,
        re.compile(r'require\("\./([^"]+)"\)', re.M),
        _relpath_to_path,
    ),
    "go": (
        re.compile(r'^import "([^"./][^"]*)"$', re.M),
        _ident,
        re.compile(r'^import "\./([^"]+)"$', re.M),
        _relpath_to_path,
    ),
    "java": (
        re.compile(r"^import (?!self\.)([\w.]+);$", re.M),
        _dots_to_repo,
        re.compile(r"^import self\.([\w.]+);$", re.M),
        _stem_dots_to_path,
    ),
    "rs": (
        re.compile(r"^use (?!crate::)([\w:]+);$", re.M),
        _rs_to_repo,
        re.compile(r"^use crate::([\w:]+);$", re.M),
        _stem_cc_to_path,
    ),
}


def extract_edge_keys(batch: pa.Table) -> pa.Table:
    """corpus batch -> (src_key, dst_key, level) rows, variable per input row.

    Vectorization note: regex findall is inherently per-document; the loop
    body is a single compiled C-regex scan per row — no per-character Python.
    Duplicates and self-imports are preserved (dedup is a separate stage).
    """
    repos = batch["repo"].to_pylist()
    paths = batch["path"].to_pylist()
    langs = batch["lang"].to_pylist()
    contents = batch["content"].to_pylist()
    src_keys: list[str] = []
    dst_keys: list[str] = []
    levels: list[str] = []
    for repo, path, lang, content in zip(repos, paths, langs, contents):
        spec = EXTRACTORS.get(lang)
        if spec is None or content is None:
            continue
        cross_re, cross_dec, sib_re, sib_dec = spec
        for tok in cross_re.findall(content):
            src_keys.append(repo)
            dst_keys.append(cross_dec(tok))
            levels.append("repo")
        if sib_re is not None:
            file_key = f"{repo}:{path}"
            for tok in sib_re.findall(content):
                src_keys.append(file_key)
                dst_keys.append(f"{repo}:{sib_dec(tok, lang)}")
                levels.append("file")
    return pa.Table.from_arrays(
        [pa.array(src_keys), pa.array(dst_keys), pa.array(levels)],
        schema=EDGE_KEY_SCHEMA,
    )


def extract_edges(corpus_ds, level: str | None = None):
    """corpus Dataset -> edge-key Dataset; optionally filter to one level.

    Drops ``content`` immediately after extraction so downstream shuffles
    move only narrow rows (SURVEY.md §7.3.9).
    """
    ds = corpus_ds.map_batches(
        extract_edge_keys, batch_format="pyarrow", zero_copy_batch=True
    )
    if level is not None:
        ds = ds.map_batches(
            lambda t, lv=level: t.filter(pa.compute.equal(t["level"], lv)),
            batch_format="pyarrow",
            zero_copy_batch=True,
        )
    return ds
