"""Graph IO beyond Parquet — the reference's `io/` module family
(EdgeListReader/Writer with configurable separator/comment/offset,
METISGraphReader; SURVEY.md §2.3).

Scale split, stated explicitly:
- **Edge lists** stream: `ray.data.read_text` -> vectorized pandas parsing
  per batch; the writer is `write_csv` with a delimiter.  These are the
  formats that exist at 100-TB scale (sharded text files).
- **METIS** is a line-number-addressed single-file format (vertex id =
  line index), which cannot be parsed from unordered distributed blocks;
  `read_metis_file` is therefore a documented DRIVER-SIDE compat loader
  for interchange with the reference ecosystem, not a scale path.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa


def read_edge_list(
    paths,
    separator: str | None = None,
    comment: str = "#",
    offset: int = 0,
    weighted: bool = False,
    default_weight: float = 1.0,
):
    """Edge-list text file(s) -> Dataset(src, dst, w).

    ``separator=None`` splits on arbitrary whitespace (the reference
    EdgeListReader's default); ``comment``-prefixed and blank lines are
    skipped; ``offset`` is subtracted from both endpoints (1-indexed
    formats use offset=1).  Extra columns beyond the first two (or three
    when ``weighted``) are ignored."""
    import ray.data

    def parse(batch: pd.DataFrame) -> pa.Table:
        lines = batch["text"].astype(str).str.strip()
        keep = (lines.str.len() > 0) & ~lines.str.startswith(comment)
        lines = lines[keep]
        if len(lines) == 0:
            return pa.table(
                {
                    "src": pa.array([], pa.int64()),
                    "dst": pa.array([], pa.int64()),
                    "w": pa.array([], pa.float64()),
                }
            )
        parts = lines.str.split(separator, expand=True)
        src = pd.to_numeric(parts[0]).astype(np.int64) - offset
        dst = pd.to_numeric(parts[1]).astype(np.int64) - offset
        if weighted and parts.shape[1] > 2:
            w = pd.to_numeric(parts[2]).fillna(default_weight).astype(np.float64)
        else:
            w = np.full(len(src), default_weight, dtype=np.float64)
        return pa.table(
            {
                "src": src.to_numpy(),
                "dst": dst.to_numpy(),
                "w": np.asarray(w, dtype=np.float64),
            }
        )

    return ray.data.read_text(paths).map_batches(parse, batch_format="pandas")


def write_edge_list(edges_ds, path: str, separator: str = " ", weighted: bool = True):
    """Dataset(src, dst[, w]) -> sharded headerless text files (one
    directory, one file per block — resumable/partitioned output)."""
    from pyarrow import csv as pacsv

    cols = ["src", "dst", "w"] if weighted else ["src", "dst"]
    edges_ds.select_columns(cols).write_csv(
        path,
        arrow_csv_args_fn=lambda: {
            "write_options": pacsv.WriteOptions(
                include_header=False, delimiter=separator
            )
        },
    )


def read_metis_file(path: str):
    """METIS adjacency format -> Dataset(src, dst, w); DRIVER-SIDE compat
    loader (see module docstring).  Header: "n m [fmt [ncon]]"; fmt is a
    3-bit flag field (100 = vertex sizes, 010 = vertex weights, 001 = edge
    weights); line i (1-based) is "[size] [vw_1..vw_ncon] nb [w] nb [w] ..."
    with 1-based neighbor ids.  Vertex sizes/weights are skipped (the edge
    table has no per-vertex payload); edge weights are carried in ``w``."""
    import ray.data

    srcs: list[int] = []
    dsts: list[int] = []
    ws: list[float] = []
    with open(path) as fh:
        header: list[str] = []
        vid = 0
        for line in fh:
            line = line.strip()
            if not line or line.startswith("%"):
                continue
            if not header:
                header = line.split()
                fmt = int(header[2]) if len(header) > 2 else 0
                if not 0 <= fmt <= 111 or fmt % 10 > 1 or (fmt // 10) % 10 > 1:
                    raise ValueError(f"invalid METIS fmt field: {header[2]!r}")
                has_size = fmt >= 100
                has_vw = (fmt // 10) % 10 == 1
                has_ew = fmt % 10 == 1
                ncon = int(header[3]) if len(header) > 3 else (1 if has_vw else 0)
                continue
            toks = line.split()
            skip = (1 if has_size else 0) + (ncon if has_vw else 0)
            toks = toks[skip:]
            if has_ew:
                if len(toks) % 2:
                    raise ValueError(
                        f"METIS line {vid + 1}: odd token count with edge weights"
                    )
                for nb, w in zip(toks[0::2], toks[1::2]):
                    srcs.append(vid)
                    dsts.append(int(nb) - 1)
                    ws.append(float(w))
            else:
                for nb in toks:
                    srcs.append(vid)
                    dsts.append(int(nb) - 1)
                    ws.append(1.0)
            vid += 1
    return ray.data.from_arrow(
        pa.table(
            {
                "src": np.array(srcs, dtype=np.int64),
                "dst": np.array(dsts, dtype=np.int64),
                "w": np.array(ws, dtype=np.float64),
            }
        )
    )


def read_snap(paths, weighted: bool = False):
    """SNAP edge lists (the most common public-graph format; reference
    io/SNAPGraphReader): '#'-comment lines, tab-or-whitespace separated,
    0-based ids.  Streams via read_text -> vectorized parse."""
    return read_edge_list(paths, separator=None, comment="#", weighted=weighted)


def write_snap(edges_ds, path: str, weighted: bool = False):
    """Dataset(src, dst[, w]) -> sharded SNAP-style tab-separated files."""
    write_edge_list(edges_ds, path, separator="\t", weighted=weighted)


def read_konect(paths, weighted: bool = True):
    """KONECT out.* edge lists (reference io/KONECTGraphReader):
    '%'-comment meta lines, whitespace separated, 1-BASED ids, optional
    weight (3rd) and timestamp (4th, ignored) columns."""
    return read_edge_list(
        paths, separator=None, comment="%", offset=1, weighted=weighted
    )


def read_gml_file(path: str):
    """GML graph file -> Dataset(src, dst, w); DRIVER-SIDE compat loader
    (single-file block format, like METIS — see module docstring).
    Parses `node [ id N ]` / `edge [ source A target B (value|weight) W ]`
    blocks; node ids map through unchanged."""
    import re

    import ray.data

    text = open(path).read()
    srcs: list[int] = []
    dsts: list[int] = []
    ws: list[float] = []
    for m in re.finditer(r"edge\s*\[([^\]]*)\]", text):
        body = m.group(1)
        s = re.search(r"\bsource\s+(-?\d+)", body)
        t = re.search(r"\btarget\s+(-?\d+)", body)
        if s is None or t is None:
            raise ValueError(f"GML edge block missing source/target: {body!r}")
        wm = re.search(r"\b(?:value|weight)\s+(-?[\d.eE+]+)", body)
        srcs.append(int(s.group(1)))
        dsts.append(int(t.group(1)))
        ws.append(float(wm.group(1)) if wm else 1.0)
    return ray.data.from_arrow(
        pa.table(
            {
                "src": np.array(srcs, dtype=np.int64),
                "dst": np.array(dsts, dtype=np.int64),
                "w": np.array(ws, dtype=np.float64),
            }
        )
    )


def read_partition_file(path: str):
    """PartitionReader (reference io/PartitionReader): one integer label
    per line, vertex id = LINE INDEX — line-number-addressed like METIS,
    so a DRIVER-SIDE compat loader (see module docstring; the scale path
    for labelings is partitioned Parquet).  -> Dataset(vid, label)."""
    import ray.data

    labels = []
    with open(path) as fh:
        for line in fh:
            line = line.strip()
            if line:
                labels.append(int(line))
    return ray.data.from_arrow(
        pa.table(
            {
                "vid": np.arange(len(labels), dtype=np.int64),
                "label": np.array(labels, dtype=np.int64),
            }
        )
    )


def write_partition_file(labels_ds, path: str):
    """PartitionWriter (reference io/PartitionWriter): inverse of
    ``read_partition_file`` — vertex id = line index, so vids must be
    dense 0..n-1 (raises otherwise).  Driver-side compat writer: the
    output is one ordered text file by definition.  Streams sorted blocks
    via iter_batches (never a whole-table driver copy)."""
    n = 0
    with open(path, "w") as fh:
        for batch in (
            labels_ds.select_columns(["vid", "label"])
            .sort("vid")
            .iter_batches(batch_format="pandas")
        ):
            vids = batch["vid"].to_numpy(np.int64)
            if len(vids) and (vids[0] != n or np.any(np.diff(vids) != 1)):
                raise ValueError("write_partition_file needs dense vids 0..n-1")
            n += len(vids)
            fh.writelines(f"{int(x)}\n" for x in batch["label"])


def read_cover_file(path: str):
    """CoverReader (reference io/CoverReader): line k lists the 1-BASED
    member node ids of subset k — subset id = line index, so a
    DRIVER-SIDE compat loader.  Vertices may appear in multiple subsets
    (it is a cover, not a partition).  -> Dataset(vid, subset)."""
    import ray.data

    vids: list[int] = []
    subs: list[int] = []
    sid = 0
    with open(path) as fh:
        for line in fh:
            toks = line.split()
            if not toks:
                continue
            for t in toks:
                vids.append(int(t) - 1)
                subs.append(sid)
            sid += 1
    return ray.data.from_arrow(
        pa.table(
            {
                "vid": np.array(vids, dtype=np.int64),
                "subset": np.array(subs, dtype=np.int64),
            }
        )
    )


def write_cover_file(cover_ds, path: str):
    """CoverWriter (reference io/CoverWriter): one line per subset,
    1-based member ids.  Driver-side compat writer; subsets stream
    grouped-sorted via iter_batches."""
    cur = None
    members: list[int] = []
    with open(path, "w") as fh:

        def flush():
            if cur is not None:
                fh.write(" ".join(str(v + 1) for v in members) + "\n")

        for batch in (
            cover_ds.select_columns(["subset", "vid"])
            .sort(["subset", "vid"])
            .iter_batches(batch_format="pandas")
        ):
            for s, v in zip(
                batch["subset"].to_numpy(np.int64),
                batch["vid"].to_numpy(np.int64),
            ):
                if s != cur:
                    flush()
                    cur, members = s, []
                members.append(int(v))
        flush()


def write_dot(edges_ds, path: str, name: str = "G", directed: bool = False):
    """DotGraphWriter (reference io/DotGraphWriter): Graphviz DOT text.
    DOT is a single-file bracketed format (header + footer), so this is a
    DRIVER-SIDE compat writer streaming edge blocks via iter_batches —
    interchange with viz tooling, not a scale path."""
    arrow = "->" if directed else "--"
    kind = "digraph" if directed else "graph"
    with open(path, "w") as fh:
        fh.write(f"{kind} {name} {{\n")
        for batch in edges_ds.select_columns(["src", "dst"]).iter_batches(
            batch_format="pandas"
        ):
            fh.writelines(
                f"  {int(s)} {arrow} {int(d)};\n"
                for s, d in zip(batch["src"], batch["dst"])
            )
        fh.write("}\n")


def read_line_file(paths):
    """LineFileReader (reference io/LineFileReader): text lines as a
    Dataset — the one reference reader that is ALREADY a Ray Data
    primitive.  -> Dataset(text)."""
    import ray.data

    return ray.data.read_text(paths)
