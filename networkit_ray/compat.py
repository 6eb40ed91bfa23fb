"""Compatibility patches for Ray Data 2.49.

Upstream bug (ray._internal hash_shuffle, observed in 2.49.2): when a
Dataset that contains empty blocks (e.g. the materialized output of a
skewed hash join) feeds another join/shuffle, ``_shuffle_block`` early-
returns on the empty block WITHOUT broadcasting its schema, while the
operator already marked the sequence's schema as broadcast.  Aggregators
whose partition stays empty then hold 0-column tables and
``pyarrow.Table.join`` fails with:

    ArrowInvalid: No match or multiple matches for key field reference
    FieldRef.Name(...)

Reproduced with a star graph (all edges share one src => 3 of 4 join
partitions empty) — see tests/test_pagerank.py::star50.

Fix: when asked to broadcast schemas (``send_empty_blocks=True``) and the
block is empty but has a schema, fan schema-carrying empty shards out to
every aggregator (exactly what the non-empty path does for missing
partitions) instead of early-returning.  Behavior for non-empty blocks is
delegated to the original implementation, so this is a strict superset.
"""

from __future__ import annotations

import ray

_PATCHED = False


def apply_patches() -> None:
    global _PATCHED
    if _PATCHED:
        return
    try:
        import ray.data._internal.execution.operators.hash_shuffle as hs

        original_fn = hs._shuffle_block._function

        def _shuffle_block_fixed(
            block,
            input_index,
            key_columns,
            pool,
            block_transformer=None,
            send_empty_blocks=False,
            override_partition_id=None,
        ):
            blk = block_transformer(block) if block_transformer is not None else block
            blk = hs.TableBlockAccessor.try_convert_block_type(
                blk, block_type=hs.BlockType.ARROW
            )
            if blk.num_rows == 0 and send_empty_blocks and blk.num_columns > 0:
                stats = hs.BlockExecStats.builder()
                pending = []
                for pid in range(pool.num_partitions):
                    shard = hs._create_empty_table(blk.schema)
                    agg = pool.get_aggregator_for_partition(pid)
                    pending.append(agg.submit.remote(input_index, pid, ray.put(shard)))
                while pending:
                    _, pending = ray.wait(
                        pending, num_returns=len(pending), timeout=1
                    )
                meta = hs.BlockAccessor.for_block(blk).get_metadata(
                    exec_stats=stats.build()
                )
                return meta, {}
            return original_fn(
                blk,
                input_index,
                key_columns,
                pool,
                None,
                send_empty_blocks,
                override_partition_id,
            )

        hs._shuffle_block = ray.remote(_shuffle_block_fixed)

        # Second half of the fix: the operator marks a sequence's schema as
        # broadcast as soon as its FIRST block is submitted — even when that
        # block is a schema-less (0-column) empty produced by a prior skewed
        # join, which can never broadcast anything.  Filter 0-column empties
        # out of incoming bundles entirely (they carry no information);
        # schema-ful empties pass through and broadcast via the patch above.
        from ray.data._internal.execution.interfaces import RefBundle

        orig_add = hs.HashShufflingOperatorBase._do_add_input_inner

        def _patched_add(self, input_bundle, input_index):
            refs = input_bundle.block_refs
            metas = input_bundle.metadata
            import pyarrow as _pa

            keep = []
            for ref, meta in zip(refs, metas):
                if meta.num_rows == 0:
                    blk = ray.get(ref)
                    ncols = getattr(blk, "num_columns", 1)
                    if ncols == 0:
                        continue
                    # empty pandas map_groups outputs arrive as null-typed
                    # Arrow columns; they poison join keys ("Data type null
                    # is not supported in join key field") and carry no info
                    if hasattr(blk, "schema") and all(
                        _pa.types.is_null(f.type) for f in blk.schema
                    ):
                        continue
                keep.append((ref, meta))
            if len(keep) != len(refs):
                if not keep:
                    return
                input_bundle = RefBundle(
                    tuple(keep),
                    schema=input_bundle.schema,
                    owns_blocks=input_bundle.owns_blocks,
                )
            return orig_add(self, input_bundle, input_index)

        hs.HashShufflingOperatorBase._do_add_input_inner = _patched_add

        # NOTE: JoiningShuffleAggregation.finalize runs inside the shuffle
        # aggregator ACTORS (worker processes re-import pristine ray
        # modules), so it cannot be monkeypatched from the driver.  The one
        # case the two driver-side patches above cannot cover — a join
        # input sequence that is *entirely* empty (no schema to broadcast
        # at all) — is therefore guarded at the call sites instead (see
        # `_empty_side_guard` docstrings in pipelines/*).
        _PATCHED = True
    except Exception as exc:  # pragma: no cover - future Ray versions
        # If internals moved, leave Ray untouched — but SAY SO: without the
        # patches, skewed/empty-block hash joins resurface as sporadic
        # ArrowInvalid failures that look like data bugs.
        import warnings

        warnings.warn(
            f"networkit_ray.compat: Ray {ray.__version__} hash-shuffle "
            f"internals changed; empty-block join workarounds NOT applied "
            f"({exc!r}). Skewed joins may fail with ArrowInvalid — "
            f"re-validate the upstream fix status for this Ray version.",
            RuntimeWarning,
            stacklevel=2,
        )
        return
    if not ray.__version__.startswith("2.49"):
        import warnings

        warnings.warn(
            f"networkit_ray.compat: empty-block shuffle patches were "
            f"written against Ray 2.49.x but applied on {ray.__version__}; "
            f"verify they are still needed/correct.",
            RuntimeWarning,
            stacklevel=2,
        )
