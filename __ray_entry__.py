"""Driver contract for the graft builder (Ray Data target).

entry():    flagship CDC pipeline (pages lake) on sf0.001.
queries():  one entry per implemented operator/pipeline from SURVEY.md §2
            plus the training-data operators; each callable takes sf_dir.
oracle_sql(): DuckDB-equivalent SQL for every SQL-expressible query, with
            matching column names.

Ray is initialised by the driver BEFORE this module is imported: nothing
here calls ray.init()/ray.shutdown().

Operator-ID map (SURVEY.md §2 → query name):
  S1/S2/O1  segment source + sort         → exercised by every cdc_* query
  S3/S4     snapshot scan                 → cdc_snapshot_read, cdc_snapshot_handoff
  P1/P2     op classify                   → cdc_changelog_counts
  P6        envelope build (+before)      → cdc_before_images
  P7        field blacklist               → cdc_field_blacklist
  P8        table include regex           → cdc_table_filter
  P9/D1     watermark dedup               → cdc_replay_dup
  P10/P12   type conversion rules         → type_normalization
  L2/A3/D2  LWW upsert + tombstones       → cdc_lww_state, cdc_tombstones
  A2        running max offsets           → cdc_watermarks
  A1        row-scoped max                → row_scoped_max
  A4        counters                      → cdc_changelog_counts
  T2/T3/T5  manifest/resume               → cdc_restart_resume, cdc_schema_evolution
  pre-agg combiner pattern                → agg_presum_groupby
  training-data ops                       → dedup_*, text_*, ann_*, multimodal_meta
"""

from __future__ import annotations

import os
from collections.abc import Callable
from typing import Any

NUM_PARTITIONS = 8  # keep in sync with pipelines/events_cdc.py


# ---------------------------------------------------------------------------
# flagship


def entry() -> Any:
    """Flagship: pages-lake CDC replay on sf0.001-scale synthetic pages
    (snapshot → stream with dup re-delivery → restart-resume), through the
    merge-on-read sink with threshold auto-compaction, returning the final
    lake as a ray.data.Dataset."""
    from debezium_incubator_ray import gen
    from debezium_incubator_ray import schema as S
    from debezium_incubator_ray.config import EngineConfig
    from debezium_incubator_ray.pipelines.cdc import CdcEngine
    from debezium_incubator_ray.pipelines.events_cdc import scratch_dir

    root = scratch_dir("flagship")
    binlog, lake = os.path.join(root, "binlog"), os.path.join(root, "lake")
    spec = gen.BinlogSpec(
        n_events=6000, n_initial=1000, seg_rows=512, num_partitions=8, seed=42
    )
    ev = gen.gen_events(spec)
    gen.write_binlog(binlog, spec, ev)
    cfg = EngineConfig(
        num_partitions=8, apply_concurrency=4, target_rows_per_file=2000,
        sink_mode="mor", mor_compact_deltas=4,
    )
    eng = CdcEngine(lake, cfg, payload_schema=S.pages_schema())
    eng.snapshot(gen.make_pages(spec.n_initial))
    eng.apply_epoch(binlog, max_segments=4)
    del eng
    eng = CdcEngine(lake)  # restart-resume from the manifest (incl. sink mode)
    eng.run(binlog)
    eng.manifest.doc["segments_done"] = []  # dup re-delivery: must no-op
    eng.apply_epoch(binlog)
    eng.compact()  # fold remaining deltas + state-preserving run coalescing
    eng.vacuum(keep_versions=2)  # expire superseded files, keep 1 time-travel step
    return eng.read_lake()


# ---------------------------------------------------------------------------
# queries


def queries() -> dict[str, Callable[[str], Any]]:
    from debezium_incubator_ray.pipelines import events_cdc as EC

    def cdc_lww_state(sf_dir):
        return EC.final_state(sf_dir)

    def cdc_partial_updates(sf_dir):
        """merge_mode='partial': per-CELL last-writer-wins — update events
        carry a modified-cell bitmask (Cassandra RowData holds only the
        modified cells, RowData.java:28-33 + CellData.java:23-60); unset
        cells inherit the lake value, a row deletion shadows older cells.
        Driven as two epochs so inheritance crosses a commit boundary."""
        return EC.final_state_partial(sf_dir)

    def cdc_partial_blacklist(sf_dir):
        """Per-cell merge UNDER a field blacklist: the blacklisted column
        never reaches the lake and the cell bitmask re-indexes over the
        remaining emitted columns — bit order must follow the shaped
        schema, not the writer's."""
        return EC.final_state_partial(sf_dir, field_blacklist=("props",))

    def cdc_partial_evolution(sf_dir):
        """Per-cell merge across an add_column evolution: v1 lake runs are
        lazily backfilled with the default, v2 writers carry the new cell
        under a 6th mask bit, and unset cells inherit the upgraded
        default."""
        return EC.final_state_partial_evolution(sf_dir)

    def cdc_partial_mor(sf_dir):
        """Per-cell merge with a merge-on-read sink: epochs append PATCH
        delta runs (payload + cell masks) and the read path folds them in
        version order — the SSTable cell-merge model (a Cassandra read
        reconciling cells across SSTables)."""
        return EC.final_state_partial(sf_dir, sink_mode="mor")

    def cdc_counter_col(sf_dir):
        """Cassandra counter-table semantics: the ``value`` column is
        declared a COUNTER — set cells accumulate (sum of live
        contributions since the key's last row deletion) instead of
        last-writer-wins; the other cells keep per-cell LWW."""
        return EC.final_state_partial(sf_dir, counter_cols=("value",))

    def cdc_range_erase(sf_dir):
        """Key-range erasure (Cassandra range-tombstone / partition-delete
        analog): every live row with key in [10, 59] is removed by a
        three-way zone-pruned sweep over the key-sorted runs — disjoint
        runs untouched, wholly-inside runs dropped unread, straddlers
        rewritten."""
        return EC.final_state_range_erased(sf_dir, 10, 59)

    def cdc_truncate(sf_dir):
        """TRUNCATE TABLE event mid-stream (op='t', the Debezium truncate
        record): the keyless control marker wipes every row whose LSN
        precedes it — lake rows and same-epoch older events — while later
        events re-create their keys. Events carry lsn = 2*event_id; the
        marker lands at 2*T+1 (T = max(event_id)*3//5) replicated into
        every binlog partition, so exactly event_id > T survives LWW."""
        return EC.final_state_truncated(sf_dir)

    def cdc_replay_dup(sf_dir):
        return EC.final_state(sf_dir, replay_twice=True)

    def cdc_restart_resume(sf_dir):
        return EC.final_state(sf_dir, restart_midway=True)

    def cdc_snapshot_handoff(sf_dir):
        return EC.snapshot_then_stream(sf_dir)

    def cdc_snapshot_filter(sf_dir):
        """Debezium snapshot.select.statement.overrides: the snapshot scan
        carries a row predicate (value >= 30) — rows failing it never enter
        the lake; the binlog then streams only EVEN users' events, so odd
        users stay snapshot-only (filtered) while even users' stream
        events land regardless (the override filters the bulk load, not
        the stream). Also exercises the table-wide watermark floor at the
        snapshot position."""
        import numpy as np
        import pyarrow as pa
        import pyarrow.compute as pc
        from debezium_incubator_ray.pipelines.events_cdc import (
            load_events, make_engine, scratch_dir, snapshot_source,
            write_env_binlog, events_envelopes,
        )

        t = load_events(sf_dir)
        handoff = int(pc.max(t["event_id"]).as_py()) // 2
        env = events_envelopes(sf_dir)  # row-aligned with load_events
        even = pc.equal(pc.bit_wise_and(t["user_id"], 1), 0)
        root = scratch_dir("snapfilter")
        binlog, lake = os.path.join(root, "binlog"), os.path.join(root, "lake")
        write_env_binlog(env.filter(even), binlog)
        eng = make_engine(lake)
        eng.snapshot(
            snapshot_source(sf_dir, handoff), snapshot_lsn=handoff,
            row_filter=lambda b: pc.fill_null(
                pc.greater_equal(b["value"], 30.0), False
            ),
        )
        eng.run(binlog)
        return eng.lake_table(include_lsn=False)

    def cdc_field_blacklist(sf_dir):
        return EC.final_state(sf_dir, field_blacklist=["props"])

    def _final_state_with_cfg(sf_dir, tag, **cfg_overrides):
        """LWW drive with EngineConfig overrides, lake returned with the
        public ``lsn`` column name (the cdc_table_filter pattern)."""
        import pyarrow as pa
        from debezium_incubator_ray import schema as S
        from debezium_incubator_ray.pipelines.events_cdc import (
            make_engine, scratch_dir, write_events_binlog,
        )

        root = scratch_dir(tag)
        binlog, lake = os.path.join(root, "binlog"), os.path.join(root, "lake")
        write_events_binlog(sf_dir, binlog)
        eng = make_engine(lake, **cfg_overrides)
        eng.run(binlog)
        out = eng.lake_table(include_lsn=True)
        i = out.schema.get_field_index(S.LSN)
        return out.set_column(i, pa.field("lsn", pa.int64()), out[S.LSN])

    def cdc_column_mask(sf_dir):
        """Debezium column SMT parity (column.mask.with.length.chars +
        column.mask.hash.*): props is masked to '******', event_type is
        replaced by its md5 hex digest — redaction happens at normalize,
        vectorized (hash once per DISTINCT value), NULLs stay NULL, and
        the redacted value is what the LWW merge stores."""
        return _final_state_with_cfg(
            sf_dir, "colmask",
            column_transforms=(("props", "mask", 6), ("event_type", "hash")),
        )

    def cdc_flatten_rewrite(sf_dir):
        """ExtractNewRecordState SMT (rewrite mode): envelope stream →
        flat rows — payload from after, deletes kept with payload from
        the BEFORE image and __deleted='true', __op/__lsn metadata
        attached. Pure map_batches, no shuffle."""
        from debezium_incubator_ray.pipelines.derive import flatten_envelopes
        from debezium_incubator_ray.pipelines.events_cdc import (
            EVENTS_PAYLOAD, events_envelopes,
        )

        env = events_envelopes(sf_dir)
        out = flatten_envelopes(env, EVENTS_PAYLOAD, delete_handling="rewrite")
        return out.select_columns(
            ["user_id", "ts", "event_type", "value", "props",
             "__op", "__lsn", "__deleted"]
        )

    def cdc_flatten_drop(sf_dir):
        """ExtractNewRecordState SMT (drop mode): deletes removed from
        the flattened stream — the append-only-sink shape."""
        from debezium_incubator_ray.pipelines.derive import flatten_envelopes
        from debezium_incubator_ray.pipelines.events_cdc import (
            EVENTS_PAYLOAD, events_envelopes,
        )

        env = events_envelopes(sf_dir)
        out = flatten_envelopes(env, EVENTS_PAYLOAD, delete_handling="drop")
        return out.select_columns(
            ["user_id", "ts", "event_type", "value", "props", "__op", "__lsn"]
        )

    def cdc_column_truncate(sf_dir):
        """Debezium column.truncate.to.length.chars parity: props keeps
        only its first 8 characters (by codepoint, matching SQL left())."""
        return _final_state_with_cfg(
            sf_dir, "coltrunc",
            column_transforms=(("props", "truncate", 8),),
        )

    def cdc_table_filter(sf_dir):
        import pyarrow as pa
        from debezium_incubator_ray.pipelines.events_cdc import (
            make_engine, scratch_dir, write_events_binlog,
        )

        root = scratch_dir("tfilter")
        binlog, lake = os.path.join(root, "binlog"), os.path.join(root, "lake")
        write_events_binlog(sf_dir, binlog, table_name_by_parity=True)
        eng = make_engine(lake, table_include_regex=r"^events_a$")
        eng.run(binlog)
        out = eng.lake_table(include_lsn=True)
        from debezium_incubator_ray import schema as S

        i = out.schema.get_field_index(S.LSN)
        return out.set_column(i, pa.field("lsn", pa.int64()), out[S.LSN])

    def cdc_error_quarantine(sf_dir):
        """Per-segment error quarantine (QueueProcessor.java:85-106,
        CommitLogProcessor.java:103-112 ERROR_FOLDER semantics): one
        binlog segment is corrupted on disk; the epoch records it in the
        manifest's quarantine set and applies every other segment — a
        corrupt file never fails the epoch and is never retried. The
        final lake state is LWW over all events except the quarantined
        segment's rows."""
        import pyarrow as pa
        from debezium_incubator_ray.pipelines.events_cdc import (
            make_engine, scratch_dir, write_events_binlog,
        )
        from debezium_incubator_ray import schema as S

        root = scratch_dir("quar")
        binlog = os.path.join(root, "binlog")
        lake = os.path.join(root, "lake")
        write_events_binlog(sf_dir, binlog)
        bad = os.path.join(binlog, "p=3", "seg-00000.parquet")
        with open(bad, "wb") as f:
            f.write(b"NOT A PARQUET FILE \x00\x01\x02 deliberately corrupt")
        eng = make_engine(lake)
        eng.run(binlog)
        assert eng.manifest.doc.get("segments_error"), (
            "corrupt segment was not quarantined"
        )
        out = eng.lake_table(include_lsn=True)
        i = out.schema.get_field_index(S.LSN)
        return out.set_column(i, pa.field("lsn", pa.int64()), out[S.LSN])

    def cdc_segment_archive(sf_dir):
        """Processed-segment archival (CommitLogTransfer.java:15-35,
        QueueProcessor.java:29-30 ARCHIVE_FOLDER): after each epoch's
        manifest flush, applied segment files move to
        _relocation/archive/<rel>; the binlog dir drains to empty and the
        lake state is identical to leaving them in place. The query
        asserts the relocation layout, then returns the LWW state."""
        import pyarrow as pa
        from debezium_incubator_ray.pipelines.events_cdc import (
            make_engine, scratch_dir, write_events_binlog,
        )
        from debezium_incubator_ray import schema as S

        root = scratch_dir("arch")
        binlog = os.path.join(root, "binlog")
        lake = os.path.join(root, "lake")
        write_events_binlog(sf_dir, binlog)
        n_segs = sum(
            len(files) for _, _, files in os.walk(binlog) if files
        )
        eng = make_engine(lake, segment_transfer="archive")
        eng.run(binlog)
        arch = os.path.join(binlog, "_relocation", "archive")
        moved = sum(len(files) for _, _, files in os.walk(arch) if files)
        left = [
            f for p, _, files in os.walk(binlog) for f in files
            if "_relocation" not in p
        ]
        assert moved == n_segs and not left, (
            f"archive moved {moved}/{n_segs}, left behind {left}"
        )
        out = eng.lake_table(include_lsn=True)
        i = out.schema.get_field_index(S.LSN)
        return out.set_column(i, pa.field("lsn", pa.int64()), out[S.LSN])

    def cdc_reshard(sf_dir):
        """Online lake re-partitioning P=8 -> P=16 mid-stream: half the
        binlog applies at P=8 (aligned fast path), reshard() re-routes
        every row by the new partition id in a two-stage exchange with
        one atomic manifest swap (min-watermark rule), and the remaining
        old-layout segments drain through the exchange path against the
        resharded lake — final state identical to an unresharded run."""
        import pyarrow as pa
        from debezium_incubator_ray.pipelines.events_cdc import (
            make_engine, scratch_dir, write_events_binlog,
        )
        from debezium_incubator_ray import schema as S

        root = scratch_dir("reshard")
        binlog = os.path.join(root, "binlog")
        lake = os.path.join(root, "lake")
        write_events_binlog(sf_dir, binlog)
        eng = make_engine(lake)
        eng.apply_epoch(binlog, max_segments=4)
        st = eng.reshard(16)
        assert st["num_partitions"] == 16
        eng.run(binlog)
        assert eng.manifest.num_partitions == 16
        out = eng.lake_table(include_lsn=True)
        i = out.schema.get_field_index(S.LSN)
        return out.set_column(i, pa.field("lsn", pa.int64()), out[S.LSN])

    def cdc_lake_clone(sf_dir):
        """Zero-copy lake branch mid-stream: half the binlog applies,
        clone() hardlinks the current runs into an independent lake at
        the same stream position, the CLONE drains the remainder while
        the original stays frozen at the branch point — CoW makes the
        shared inodes safe. Returns the clone's final LWW state; asserts
        the original is untouched."""
        import pyarrow as pa
        from debezium_incubator_ray.pipelines.events_cdc import (
            make_engine, scratch_dir, write_events_binlog,
        )
        from debezium_incubator_ray import schema as S

        root = scratch_dir("clone")
        binlog = os.path.join(root, "binlog")
        lake = os.path.join(root, "lake")
        write_events_binlog(sf_dir, binlog)
        eng = make_engine(lake)
        eng.apply_epoch(binlog, max_segments=4)
        branch_rows = eng.lake_table().num_rows
        branch_v = eng.manifest.version
        branched = eng.clone(os.path.join(root, "branch"))
        branched.run(binlog)
        assert eng.lake_table().num_rows == branch_rows, (
            "original lake moved past the branch point"
        )
        assert eng.manifest.version == branch_v
        out = branched.lake_table(include_lsn=True)
        i = out.schema.get_field_index(S.LSN)
        return out.set_column(i, pa.field("lsn", pa.int64()), out[S.LSN])

    def cdc_predicate_update(sf_dir):
        """Lakehouse UPDATE ... WHERE as state surgery: after the stream
        applies, every 'error' row's value is scaled 1.1x in one
        run-sweep per partition (non-matching runs carried untouched,
        zone bounds can skip runs unread); _lsn and watermarks don't
        move — a later stream event would legally overwrite."""
        import pyarrow as pa
        import pyarrow.compute as pc
        from debezium_incubator_ray.pipelines.events_cdc import (
            make_engine, scratch_dir, write_events_binlog,
        )
        from debezium_incubator_ray import schema as S

        root = scratch_dir("upd")
        binlog = os.path.join(root, "binlog")
        lake = os.path.join(root, "lake")
        write_events_binlog(sf_dir, binlog)
        eng = make_engine(lake)
        eng.run(binlog)
        st = eng.update_rows(
            lambda t: pc.equal(t["event_type"], "error"),
            {"value": lambda t: pc.multiply(t["value"], 1.1)},
        )
        assert st["updated_rows"] > 0
        out = eng.lake_table(include_lsn=True)
        i = out.schema.get_field_index(S.LSN)
        return out.set_column(i, pa.field("lsn", pa.int64()), out[S.LSN])

    def cdc_merge_into(sf_dir):
        """SQL MERGE INTO as a synthetic aligned epoch: after the stream
        applies, (1) merge a one-shot source of every user_id % 3 == 0 up
        to max(user_id)+100 — matched rows are fully replaced
        (event_type='merged', value=user_id*0.5; omitted payload columns
        go NULL), unmatched rows insert; then (2) merge a key-only
        delete source (user_id % 7 == 0) — matched rows delete,
        unmatched skip. Each merge is stamped strictly above every
        watermark on its own offset channel ("_merge"), so exactly-once,
        LWW and time travel hold; only the small SOURCE shuffles, the
        lake never moves."""
        import numpy as np
        import pyarrow as pa
        import pyarrow.compute as pc
        import pyarrow.parquet as pq
        from debezium_incubator_ray.pipelines.events_cdc import (
            make_engine, scratch_dir, write_events_binlog,
        )
        from debezium_incubator_ray import schema as S

        root = scratch_dir("merge")
        binlog = os.path.join(root, "binlog")
        write_events_binlog(sf_dir, binlog)
        eng = make_engine(os.path.join(root, "lake"))
        eng.run(binlog)
        maxu = pc.max(
            pq.read_table(
                os.path.join(sf_dir, "events.parquet"), columns=["user_id"]
            )["user_id"]
        ).as_py()
        uids = np.arange(0, maxu + 101, dtype=np.int64)
        m3 = uids[uids % 3 == 0]
        st1 = eng.merge_into(pa.table({
            "user_id": pa.array(m3),
            "event_type": pa.array(["merged"] * len(m3), pa.string()),
            "value": pa.array(m3 * 0.5, pa.float64()),
        }))
        assert st1["updated"] > 0 and st1["inserted"] > 0, st1
        st2 = eng.merge_into(
            pa.table({"user_id": pa.array(uids[uids % 7 == 0])}),
            when_matched="delete", when_not_matched="skip",
        )
        assert st2["deleted"] > 0 and st2["skipped"] > 0, st2
        out = eng.lake_table(include_lsn=True)
        i = out.schema.get_field_index(S.LSN)
        return out.set_column(i, pa.field("lsn", pa.int64()), out[S.LSN])

    def cdc_json_envelopes(sf_dir):
        """Debezium wire-format interop: the change stream round-trips
        through JSON envelope lines ({"op","before","after","source",
        "ts_ms"} — the reference's Kafka Connect JSON converter output),
        is parsed back with pyarrow's C++ JSON reader under an EXPLICIT
        schema (one Ray task per shard, no shuffle), converted to a
        parquet binlog with the identical p=/seg layout, and applied —
        final state identical to the native parquet path."""
        import pyarrow as pa
        from debezium_incubator_ray.pipelines.events_cdc import (
            EVENTS_PAYLOAD, events_envelopes, make_engine, scratch_dir,
        )
        from debezium_incubator_ray.sources.debezium_json import (
            convert_jsonl_binlog, write_debezium_jsonl,
        )
        from debezium_incubator_ray import schema as S

        root = scratch_dir("dbzjson")
        jdir = os.path.join(root, "wire")
        binlog = os.path.join(root, "binlog")
        lake = os.path.join(root, "lake")
        env = events_envelopes(sf_dir)
        n = write_debezium_jsonl(env, jdir)
        assert convert_jsonl_binlog(jdir, binlog, EVENTS_PAYLOAD) == n
        eng = make_engine(lake)
        eng.run(binlog)
        out = eng.lake_table(include_lsn=True)
        i = out.schema.get_field_index(S.LSN)
        return out.set_column(i, pa.field("lsn", pa.int64()), out[S.LSN])

    def cdc_tombstones(sf_dir):
        import pyarrow as pa
        import pyarrow.compute as pc
        import ray.data
        from debezium_incubator_ray import schema as S
        from debezium_incubator_ray.envelope import lww_reduce
        from debezium_incubator_ray.pipelines.events_cdc import events_envelopes
        from debezium_incubator_ray.stages.normalize import NormalizeEnvelope
        from debezium_incubator_ray.pipelines.events_cdc import EVENTS_PAYLOAD

        env = events_envelopes(sf_dir)
        norm = NormalizeEnvelope(
            S.schema_to_b64(EVENTS_PAYLOAD), "user_id", NUM_PARTITIONS, "mod"
        )
        flat = ray.data.from_arrow(env).map_batches(
            norm, batch_format="pyarrow", zero_copy_batch=True
        )

        def winners_only(t: pa.Table) -> pa.Table:
            w = lww_reduce(t, "user_id")
            dead = w.filter(pc.equal(w["op"], "d"))
            return pa.table(
                {"user_id": dead["user_id"], "lsn": dead[S.LSN]}
            )

        out = flat.groupby(S.PART).map_groups(
            winners_only, batch_format="pyarrow"
        )
        return out.to_pandas()

    def cdc_watermarks(sf_dir):
        import pandas as pd
        from debezium_incubator_ray.pipelines.events_cdc import (
            make_engine, scratch_dir, write_events_binlog,
        )

        root = scratch_dir("wm")
        binlog, lake = os.path.join(root, "binlog"), os.path.join(root, "lake")
        write_events_binlog(sf_dir, binlog)
        eng = make_engine(lake)
        eng.run(binlog)
        rows = [
            {"partition": p, "watermark": eng.manifest.watermark(p)}
            for p in range(NUM_PARTITIONS)
        ]
        return pd.DataFrame(rows).astype({"partition": "int32", "watermark": "int64"})

    def cdc_changelog_counts(sf_dir):
        import ray.data
        from ray.data.aggregate import Count
        from debezium_incubator_ray.pipelines.events_cdc import events_envelopes

        env = events_envelopes(sf_dir).select(["op"])
        return ray.data.from_arrow(env).groupby("op").aggregate(Count(alias_name="n"))

    def cdc_before_images(sf_dir):
        import pyarrow as pa
        import pyarrow.compute as pc
        import ray.data
        from debezium_incubator_ray import schema as S
        from debezium_incubator_ray.pipelines.events_cdc import (
            EVENTS_PAYLOAD, events_envelopes,
        )
        from debezium_incubator_ray.stages.normalize import NormalizeEnvelope

        env = events_envelopes(sf_dir)
        norm = NormalizeEnvelope(
            S.schema_to_b64(EVENTS_PAYLOAD),
            "user_id",
            NUM_PARTITIONS,
            "mod",
            emit_before=True,
        )

        def updates_only(t: pa.Table) -> pa.Table:
            u = t.filter(pc.equal(t["op"], "u"))
            return pa.table(
                {
                    "user_id": u["user_id"],
                    "lsn": u[S.LSN],
                    "before_value": u["before_value"],
                    "value": u["value"],
                }
            )

        ds = ray.data.from_arrow(env).map_batches(
            norm, batch_format="pyarrow", zero_copy_batch=True
        ).map_batches(updates_only, batch_format="pyarrow", zero_copy_batch=True)
        return ds.to_pandas()

    def cdc_changed_columns(sf_dir):
        """Per-column change frequency over the update stream — the CDC
        profiling question "which columns actually churn" (drives partial
        envelopes, index choices, column-level retention). Each batch
        compares before_X vs X per payload column under IS DISTINCT FROM
        semantics (NULL-safe) and folds 4 partial rows; the envelope
        stream itself never shuffles."""
        import pyarrow as pa
        import pyarrow.compute as pc
        import ray.data
        from ray.data.aggregate import Sum
        from debezium_incubator_ray import schema as S
        from debezium_incubator_ray.pipelines.events_cdc import (
            EVENTS_PAYLOAD, events_envelopes,
        )
        from debezium_incubator_ray.stages.normalize import NormalizeEnvelope

        env = events_envelopes(sf_dir)
        norm = NormalizeEnvelope(
            S.schema_to_b64(EVENTS_PAYLOAD),
            "user_id",
            NUM_PARTITIONS,
            "mod",
            emit_before=True,
        )
        COLS = ["ts", "event_type", "value", "props"]

        def partial(t: pa.Table) -> pa.Table:
            u = t.filter(pc.equal(t["op"], "u"))
            n = u.num_rows
            rows = []
            for c in COLS:
                a, b = u[f"before_{c}"], u[c]
                eq = pc.fill_null(pc.equal(a, b), False)
                both_null = pc.and_(pc.is_null(a), pc.is_null(b))
                same = pc.or_(eq, both_null)  # IS NOT DISTINCT FROM
                n_same = pc.sum(pc.cast(same, pa.int64())).as_py() or 0
                rows.append({"col": c, "n_updates": n,
                             "n_changed": n - int(n_same)})
            return pa.Table.from_pylist(rows)

        folded = (
            ray.data.from_arrow(env)
            .map_batches(norm, batch_format="pyarrow", zero_copy_batch=True)
            .map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
            .groupby("col")
            .aggregate(Sum("n_updates", alias_name="n_updates"),
                       Sum("n_changed", alias_name="n_changed"))
        )

        def finish(t: pa.Table) -> pa.Table:
            nu = pc.cast(t["n_updates"], pa.float64())
            return pa.table({
                "col": t["col"],
                "n_updates": pc.cast(t["n_updates"], pa.int64()),
                "n_changed": pc.cast(t["n_changed"], pa.int64()),
                "change_rate": pc.round(
                    pc.divide(pc.cast(t["n_changed"], pa.float64()), nu), 6
                ),
            })

        return folded.map_batches(finish, batch_format="pyarrow")

    def cdc_partition_skew(sf_dir):
        """Per-partition event-count skew report over the normalized
        stream — the lineage skew gauge as a gate-pinned query: rows per
        partition, share of total, and each partition's ratio to the
        mean (the salting trigger). Pins the mod partitioner's routing
        in SQL; partial counts fold per batch, nothing big shuffles."""
        import pyarrow as pa
        import pyarrow.compute as pc
        import ray.data
        from ray.data.aggregate import Sum
        from debezium_incubator_ray import schema as S
        from debezium_incubator_ray.pipelines.events_cdc import (
            EVENTS_PAYLOAD, events_envelopes,
        )
        from debezium_incubator_ray.stages.normalize import NormalizeEnvelope

        env = events_envelopes(sf_dir)
        norm = NormalizeEnvelope(
            S.schema_to_b64(EVENTS_PAYLOAD), "user_id", NUM_PARTITIONS,
            "mod",
        )

        def partial(t: pa.Table) -> pa.Table:
            g = t.group_by(S.PART).aggregate([([], "count_all")])
            return pa.table({
                "partition": pc.cast(g[S.PART], pa.int64()),
                "n": pc.cast(g["count_all"], pa.int64()),
            })

        folded = (
            ray.data.from_arrow(env)
            .map_batches(norm, batch_format="pyarrow", zero_copy_batch=True)
            .map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
            .groupby("partition")
            .aggregate(Sum("n", alias_name="n"))
        )

        def finish(t: pa.Table) -> pa.Table:
            n = pc.cast(t["n"], pa.float64())
            total = pc.sum(n).as_py() or 0.0
            mean = total / NUM_PARTITIONS
            return pa.table({
                "partition": t["partition"],
                "n": pc.cast(t["n"], pa.int64()),
                "share": pc.round(pc.divide(n, total), 6),
                "skew": pc.round(pc.divide(n, mean), 6),
            })

        # the fold is NUM_PARTITIONS rows — a driver finish is metadata
        from debezium_incubator_ray.functions.kernels import collect_table

        return finish(collect_table(folded, empty=pa.table({
            "partition": pa.array([], pa.int64()),
            "n": pa.array([], pa.int64()),
        })))

    def cdc_reactivation_rate(sf_dir):
        """Delete-then-recreate churn over the change stream: the share
        of keys whose history has a create AFTER a delete — the
        tombstone-GC risk gauge (a high rate means purged tombstones
        would resurrect rows on replay). Per-key first-delete/last-create
        positions fold per batch; one tiny key groupby finishes."""
        import pyarrow as pa
        import pyarrow.compute as pc
        import ray.data
        from ray.data.aggregate import Max, Min
        from debezium_incubator_ray.pipelines.events_cdc import OP_SQL  # noqa: F401 (op model shared with the oracle)

        ev = ray.data.read_parquet(
            os.path.join(sf_dir, "events.parquet"),
            columns=["user_id", "event_id"],
        )

        def partial(t: pa.Table) -> pa.Table:
            import numpy as np

            eid = t["event_id"].combine_chunks().to_numpy(
                zero_copy_only=False
            )
            mod10 = eid % 10
            is_d = mod10 == 0
            is_c = (mod10 == 1) | (mod10 == 2)
            return pa.table({
                "user_id": t["user_id"],
                "fd": pa.array(np.where(is_d, eid, 2**62)),
                "lc": pa.array(np.where(is_c, eid, -1)),
            })

        per_user = (
            ev.map_batches(partial, batch_format="pyarrow",
                           zero_copy_batch=True)
            .groupby("user_id")
            .aggregate(Min("fd", alias_name="fd"),
                       Max("lc", alias_name="lc"))
        )

        def finish(t: pa.Table) -> pa.Table:
            fd = t["fd"].combine_chunks().to_numpy(zero_copy_only=False)
            lc = t["lc"].combine_chunks().to_numpy(zero_copy_only=False)
            n = len(fd)
            re = int(((fd < 2**62) & (lc > fd)).sum())
            import numpy as np

            return pa.table({
                "n_users": pa.array([n], pa.int64()),
                "n_reactivated": pa.array([re], pa.int64()),
                "rate": pa.array([round(re / n, 6) if n else 0.0],
                                 pa.float64()),
            })

        from debezium_incubator_ray.functions.kernels import collect_table

        return finish(collect_table(per_user, empty=pa.table({
            "fd": pa.array([], pa.int64()), "lc": pa.array([], pa.int64()),
        })))

    def cdc_snapshot_read(sf_dir):
        import pyarrow as pa
        import ray.data

        def to_read_envelopes(t: pa.Table) -> pa.Table:
            n = t.num_rows
            cols = {c: t[c] for c in t.column_names}
            cols["op"] = pa.array(["r"] * n, type=pa.string())
            cols["snapshot"] = pa.array([True] * n, type=pa.bool_())
            return pa.table(cols)

        ds = ray.data.read_parquet(os.path.join(sf_dir, "documents.parquet"))
        return ds.map_batches(
            to_read_envelopes, batch_format="pyarrow", zero_copy_batch=True
        )

    def _schema_evolution_impl(sf_dir, ddl_text: bool):
        """add_column with default backfill mid-stream over the events CDC
        feed: column `score:double` defined as value*2 exists only for
        events with lsn > L; earlier winners show the default -1.0.
        ``ddl_text=True`` ships the change as raw ALTER TABLE text parsed
        by ddl.parse_ddl (the reference's ANTLR path) instead of a
        structured SchemaChange — same downstream semantics."""
        import numpy as np
        import pyarrow as pa
        import pyarrow.compute as pc
        import pyarrow.parquet as pq
        import json
        from debezium_incubator_ray import schema as S
        from debezium_incubator_ray.pipelines.events_cdc import (
            events_envelopes, make_engine, scratch_dir, NUM_PARTITIONS as P,
        )
        from debezium_incubator_ray.envelope import widen_struct_column

        env = events_envelopes(sf_dir)
        src = env["source"].combine_chunks()
        lsn = src.field("lsn").to_numpy()
        L = int(lsn.max()) // 2
        after = env["after"].combine_chunks()
        target = pa.struct(list(after.type) + [pa.field("score", pa.float64())])
        wide = widen_struct_column(after, target)
        score = pc.multiply(wide.field("value"), 2.0)
        mask_v2 = pa.array(lsn > L)
        score = pc.if_else(mask_v2, score, pa.nulls(len(env), pa.float64()))
        children = [wide.field(i) for i in range(wide.type.num_fields - 1)] + [score]
        new_after = pa.StructArray.from_arrays(
            children,
            fields=[target.field(i) for i in range(target.num_fields)],
            mask=pc.invert(pc.is_valid(after)),
        )
        env = env.set_column(
            env.schema.get_field_index("after"), pa.field("after", target), new_after
        )
        env = env.set_column(
            env.schema.get_field_index("before"),
            pa.field("before", target),
            widen_struct_column(env["before"], target),
        )
        root = scratch_dir("evo")
        binlog, lake = os.path.join(root, "binlog"), os.path.join(root, "lake")
        part = src.field("partition").to_numpy()
        for p in range(P):
            idx = np.nonzero(part == p)[0]
            os.makedirs(os.path.join(binlog, f"p={p}"), exist_ok=True)
            pq.write_table(
                env.take(pa.array(idx)),
                os.path.join(binlog, f"p={p}", "seg-00000.parquet"),
            )
        with open(os.path.join(binlog, "_schema_changes.json"), "w") as f:
            if ddl_text:
                json.dump(
                    [{"ddl": "ALTER TABLE events ADD score BINARY_DOUBLE DEFAULT -1.0",
                      "at_lsn": L}],
                    f,
                )
            else:
                json.dump(
                    [S.SchemaChange("add_column", "score", "double", -1.0, L).to_json()],
                    f,
                )
        eng = make_engine(lake)
        eng.run(binlog)
        out = eng.lake_table(include_lsn=True)
        i = out.schema.get_field_index(S.LSN)
        return out.set_column(i, pa.field("lsn", pa.int64()), out[S.LSN])

    def cdc_schema_create_ddl(sf_dir):
        """Table-LIFECYCLE DDL driven from the binlog's control segment
        (CreateTableParserListener.java:28-49 / DropTableParserListener.
        java:24-43 via ddl.parse_statement): _schema_changes.json carries
        textual CREATE TABLE for the target (parsed PRIMARY KEY becomes
        the engine key; NUMBER/VARCHAR2/CLOB/TIMESTAMP types resolve per
        ColumnDefinitionParserListener), a decoy CREATE, and DROP TABLE
        ... PURGE removing the decoy. Lake.process_ddl_segment applies
        the lifecycle ops; the DDL-created engine then ingests the events
        stream; the result is the standard LWW final state plus an
        n_tables column pinning that the decoy is gone."""
        import json
        import pyarrow as pa
        from debezium_incubator_ray.config import EngineConfig
        from debezium_incubator_ray.pipelines.events_cdc import (
            NUM_PARTITIONS as P, scratch_dir, write_events_binlog,
        )
        from debezium_incubator_ray.pipelines.lake import Lake
        from debezium_incubator_ray import schema as S

        root = scratch_dir("createddl")
        binlog = os.path.join(root, "binlog")
        write_events_binlog(sf_dir, binlog)
        with open(os.path.join(binlog, "_schema_changes.json"), "w") as f:
            json.dump([
                {"ddl": "CREATE TABLE events (user_id NUMBER(18) NOT NULL, "
                        "ts TIMESTAMP, event_type VARCHAR2(64), "
                        "value BINARY_DOUBLE, props CLOB, "
                        "PRIMARY KEY (user_id))"},
                {"ddl": "CREATE TABLE decoy (id NUMBER(19) PRIMARY KEY, "
                        "v CLOB)"},
                {"ddl": "DROP TABLE decoy PURGE"},
            ], f)
        lake = Lake(os.path.join(root, "lake"))
        cfg = EngineConfig(
            num_partitions=P, partitioner="mod", apply_concurrency=4,
            target_rows_per_file=100_000,
        )
        ops = lake.process_ddl_segment(binlog, config=cfg)
        if ops != [("create", "events"), ("create", "decoy"),
                   ("drop", "decoy")] or lake.table_names() != ["events"]:
            raise AssertionError(f"lifecycle mismatch: {ops}")
        eng = lake["events"]
        if eng.cfg.key != "user_id":  # from the parsed PRIMARY KEY
            raise AssertionError(eng.cfg.key)
        eng.run(binlog)
        out = eng.lake_table(include_lsn=True)
        i = out.schema.get_field_index(S.LSN)
        out = out.set_column(i, pa.field("lsn", pa.int64()), out[S.LSN])
        return out.append_column(
            "n_tables", pa.array([len(lake.table_names())] * out.num_rows,
                                 pa.int64()))

    def cdc_schema_evolution(sf_dir):
        return _schema_evolution_impl(sf_dir, ddl_text=False)

    def cdc_schema_evolution_ddl(sf_dir):
        return _schema_evolution_impl(sf_dir, ddl_text=True)

    def cdc_schema_widen(sf_dir):
        """widen_type value float32→double mid-stream, two-phase: half the
        partitions' lake files are written under the narrow schema, then
        lazily upgraded on read (AlterTableParserListener.java:76-133 +
        OracleDatabaseSchema.java:49-64 history semantics)."""
        import pyarrow as pa
        from debezium_incubator_ray import schema as S
        from debezium_incubator_ray.pipelines.events_cdc import (
            EVENTS_PAYLOAD, final_state_schema_change,
        )

        narrow = pa.schema(
            [
                f if f.name != "value" else pa.field("value", pa.float32())
                for f in EVENTS_PAYLOAD
            ]
        )
        return final_state_schema_change(
            sf_dir,
            S.SchemaChange("widen_type", "value", "double", at_lsn=0),
            payload_schema=narrow,
            narrow_value=True,
        )

    def cdc_schema_drop(sf_dir):
        """drop_column props mid-stream, two-phase (v1 files carry props,
        dropped lazily on read after the DDL activates)."""
        from debezium_incubator_ray import schema as S
        from debezium_incubator_ray.pipelines.events_cdc import (
            final_state_schema_change,
        )

        return final_state_schema_change(
            sf_dir, S.SchemaChange("drop_column", "props", at_lsn=0)
        )

    def cdc_schema_rename(sf_dir):
        """rename_column props -> attrs mid-stream, two-phase: half the
        partitions' lake files are written under the OLD name and lazily
        renamed on read via the manifest's cumulative rename map; the
        remaining epochs' envelopes still carry the old field name and
        normalize re-aliases them — the full Debezium rename surface
        (schema history + old-name writers + old-name files)."""
        from debezium_incubator_ray import schema as S
        from debezium_incubator_ray.pipelines.events_cdc import (
            final_state_schema_change,
        )

        return final_state_schema_change(
            sf_dir,
            S.SchemaChange("rename_column", "props", to="attrs", at_lsn=0),
        )

    def cdc_multi_table(sf_dir):
        """ONE mixed binlog (events_a = even user_id, events_b = odd)
        routed to two lake tables in a single demux pass
        (RecordMaker.java:36-58 + CassandraTopicSelector.java:32-110)."""
        import pyarrow as pa
        from debezium_incubator_ray.config import EngineConfig
        from debezium_incubator_ray.pipelines.events_cdc import (
            EVENTS_PAYLOAD, NUM_PARTITIONS as P, scratch_dir, write_events_binlog,
        )
        from debezium_incubator_ray.pipelines.lake import Lake
        from debezium_incubator_ray import schema as S

        root = scratch_dir("demux")
        binlog = os.path.join(root, "binlog")
        write_events_binlog(sf_dir, binlog, table_name_by_parity=True)
        lake = Lake(os.path.join(root, "lake"))
        for t in ("events_a", "events_b"):
            lake.create_table(
                t,
                EVENTS_PAYLOAD,
                EngineConfig(
                    key="user_id", num_partitions=P, partitioner="mod",
                    apply_concurrency=4, target_rows_per_file=100_000,
                ),
            )
        lake.apply_epoch_demux(binlog)
        outs = []
        for t in ("events_a", "events_b"):
            lt = lake[t].lake_table(include_lsn=True)
            lt = lt.append_column("tbl", pa.array([t] * lt.num_rows))
            outs.append(lt)
        out = pa.concat_tables(outs)
        i = out.schema.get_field_index(S.LSN)
        return out.set_column(i, pa.field("lsn", pa.int64()), out[S.LSN])

    def cdc_outbox(sf_dir):
        """Outbox event router SMT (the Debezium outbox pattern): the whole
        stream arrives as ONE physical `outbox` table; the router rewrites
        each envelope's destination from its aggregate-type payload column
        (deletes fall back to the before image) and the single-pass demux
        commits five per-aggregate lake tables. Per (aggregate, user) the
        final row is the LWW winner among events ROUTED to that table."""
        import pyarrow as pa
        import pyarrow.compute as pc
        import pyarrow.parquet as _pq
        from debezium_incubator_ray.config import EngineConfig
        from debezium_incubator_ray.pipelines.events_cdc import (
            EVENTS_PAYLOAD, NUM_PARTITIONS as P, events_envelopes,
            scratch_dir, write_env_binlog,
        )
        from debezium_incubator_ray.pipelines.lake import Lake
        from debezium_incubator_ray.stages.normalize import make_outbox_router
        from debezium_incubator_ray import schema as S

        root = scratch_dir("outbox")
        binlog = os.path.join(root, "binlog")
        from debezium_incubator_ray.envelope import replace_source_table

        env = replace_source_table(events_envelopes(sf_dir), "outbox")
        write_env_binlog(env, binlog)
        types = sorted(
            pc.unique(
                _pq.read_table(
                    os.path.join(sf_dir, "events.parquet"),
                    columns=["event_type"],
                )["event_type"].combine_chunks()
            ).to_pylist()
        )
        lake = Lake(os.path.join(root, "lake"))
        for ty in types:
            lake.create_table(
                f"out_{ty}",
                EVENTS_PAYLOAD,
                EngineConfig(
                    key="user_id", num_partitions=P, partitioner="mod",
                    apply_concurrency=4, target_rows_per_file=100_000,
                ),
            )
        lake.apply_epoch_demux(
            binlog,
            route_fn=make_outbox_router("event_type", prefix="out_"),
        )
        outs = []
        for ty in types:
            lt = lake[f"out_{ty}"].lake_table(include_lsn=True)
            lt = lt.append_column("tbl", pa.array([f"out_{ty}"] * lt.num_rows))
            outs.append(lt)
        out = pa.concat_tables(outs)
        i = out.schema.get_field_index(S.LSN)
        return out.set_column(i, pa.field("lsn", pa.int64()), out[S.LSN])

    def cdc_compaction(sf_dir):
        """Small-run compaction is state-preserving: fragment the lake
        (tiny target_rows_per_file + small segments → many sorted runs per
        partition), compact to target-sized files, and return the table —
        which must still equal the plain LWW oracle byte-for-byte."""
        import pyarrow as pa
        from debezium_incubator_ray import schema as S
        from debezium_incubator_ray.pipelines import events_cdc as EC

        root = EC.scratch_dir("compact")
        binlog, lake = os.path.join(root, "binlog"), os.path.join(root, "lake")
        EC.write_events_binlog(sf_dir, binlog, seg_rows=512)
        eng = EC.make_engine(lake)
        eng.cfg.target_rows_per_file = 8  # fragment on purpose
        eng.run(binlog)
        P = EC.NUM_PARTITIONS
        files_before = sum(len(eng.manifest.files(p)) for p in range(P))
        eng.cfg.target_rows_per_file = 1_000_000
        st = eng.compact()
        files_after = sum(len(eng.manifest.files(p)) for p in range(P))
        if files_after >= files_before or files_after != st["files_after"]:
            raise RuntimeError(
                f"compaction did not coalesce: {files_before} -> {files_after}"
            )
        out = eng.lake_table(include_lsn=True)
        i = out.schema.get_field_index(S.LSN)
        return out.set_column(i, pa.field("lsn", pa.int64()), out[S.LSN])

    def cdc_mor_lww(sf_dir):
        """Merge-on-read sink: epoch 1 lays the base runs, later epochs
        append delta runs (no base rewrite); the read-side LWW merge must
        equal the plain LWW oracle byte-for-byte, both through the delta
        overlay AND after compaction folds the deltas back into the base."""
        import pyarrow as pa
        from debezium_incubator_ray import schema as S
        from debezium_incubator_ray.pipelines import events_cdc as EC

        import pyarrow.compute as pc

        root = EC.scratch_dir("mor")
        binlog, lake = os.path.join(root, "binlog"), os.path.join(root, "lake")
        env = EC.events_envelopes(sf_dir)
        lsn = env["source"].combine_chunks().field("lsn")
        cut = pc.max(lsn).as_py() // 2
        # two drains: the first lays every partition's base runs, the
        # second appends delta runs on top (no base rewrite)
        EC.write_env_binlog(env.filter(pc.less_equal(lsn, cut)), binlog)
        eng = EC.make_engine(lake, sink_mode="mor")
        eng.run(binlog)
        EC.write_env_binlog(env.filter(pc.greater(lsn, cut)), binlog, append=True)
        eng.run(binlog)
        P = EC.NUM_PARTITIONS
        n_deltas = sum(len(eng.manifest.deltas(p)) for p in range(P))
        if n_deltas == 0:
            raise RuntimeError("mor epochs appended no delta runs")
        merged = eng.lake_table(include_lsn=True)  # through the delta overlay
        eng.compact()
        if sum(len(eng.manifest.deltas(p)) for p in range(P)) != 0:
            raise RuntimeError("compact did not fold deltas")
        folded = eng.lake_table(include_lsn=True)
        if not folded.equals(merged):
            raise RuntimeError("state changed when deltas folded into base")
        i = merged.schema.get_field_index(S.LSN)
        return merged.set_column(i, pa.field("lsn", pa.int64()), merged[S.LSN])

    def cdc_time_travel(sf_dir):
        """Time-travel read: stream phase 1 (lsn <= cut), record the
        manifest version, stream phase 2 (tail segments in the same binlog
        dir), then read the lake AT the recorded version — must equal the
        LWW state over only the phase-1 events."""
        import pyarrow as pa
        import pyarrow.compute as pc
        from debezium_incubator_ray import schema as S
        from debezium_incubator_ray.pipelines import events_cdc as EC

        env = EC.events_envelopes(sf_dir)
        lsn = env["source"].combine_chunks().field("lsn")
        cut = int(pc.max(lsn).as_py()) // 2
        root = EC.scratch_dir("ttravel")
        binlog, lake = os.path.join(root, "binlog"), os.path.join(root, "lake")
        EC.write_env_binlog(env.filter(pc.less_equal(lsn, cut)), binlog)
        eng = EC.make_engine(lake)
        eng.run(binlog)
        v1 = eng.manifest.version
        EC.write_env_binlog(
            env.filter(pc.greater(lsn, cut)), binlog, append=True
        )
        eng.run(binlog)  # directory-tail pickup (S2) — new segments only
        out = eng.lake_table(include_lsn=True, version=v1)
        i = out.schema.get_field_index(S.LSN)
        return out.set_column(i, pa.field("lsn", pa.int64()), out[S.LSN])

    def cdc_point_lookup(sf_dir):
        """Serving-path point reads: route keys to partitions, open only
        the sorted runs whose key range can contain them — and skip runs
        whose SSTable-style Bloom sidecar proves every wanted key absent
        (bloom_filter_bits=10). Keys 0..29 plus two misses; result =
        those keys' LWW winners, identical with or without blooms."""
        import pyarrow as pa
        from debezium_incubator_ray import schema as S
        from debezium_incubator_ray.pipelines import events_cdc as EC

        root = EC.scratch_dir("lookup")
        binlog, lake = os.path.join(root, "binlog"), os.path.join(root, "lake")
        EC.write_events_binlog(sf_dir, binlog)
        eng = EC.make_engine(lake, bloom_filter_bits=10)
        eng.run(binlog)
        out = eng.lookup(list(range(30)) + [10**9, 10**9 + 1])
        i = out.schema.get_field_index(S.LSN)
        return out.set_column(i, pa.field("lsn", pa.int64()), out[S.LSN])

    def cdc_changelog_diff(sf_dir):
        """Change feed derived from two lake versions (the lake→CDC
        inverse over time travel): stream phase 1 (lsn <= cut), pin v1,
        stream phase 2, then changes_between(v1) — one c/u/d row per key
        whose LWW winner differs between the versions."""
        import pyarrow as pa
        import pyarrow.compute as pc
        from debezium_incubator_ray import schema as S
        from debezium_incubator_ray.pipelines import events_cdc as EC

        env = EC.events_envelopes(sf_dir)
        lsn = env["source"].combine_chunks().field("lsn")
        cut = int(pc.max(lsn).as_py()) // 2
        root = EC.scratch_dir("chdiff")
        binlog, lake = os.path.join(root, "binlog"), os.path.join(root, "lake")
        EC.write_env_binlog(env.filter(pc.less_equal(lsn, cut)), binlog)
        eng = EC.make_engine(lake)
        eng.run(binlog)
        v1 = eng.manifest.version
        EC.write_env_binlog(env.filter(pc.greater(lsn, cut)), binlog, append=True)
        eng.run(binlog)
        out = eng.changes_between(v1).to_arrow_refs()
        import ray as _ray

        t = pa.concat_tables(_ray.get(out), promote_options="permissive")
        i = t.schema.get_field_index(S.LSN)
        return t.set_column(i, pa.field("lsn", pa.int64()), t[S.LSN])

    def cdc_incremental_snapshot(sf_dir):
        """Watermark-based incremental snapshot over the events feed: CDC
        capture starts late (binlog holds only lsn > H); key-ordered chunk
        reads of the LIVE source backfill the missed state while streaming
        continues — a second wave of segments arrives mid-backfill. Final
        payload state must equal plain LWW over all events."""
        import pyarrow.compute as pc
        from debezium_incubator_ray.pipelines import events_cdc as EC

        env = EC.events_envelopes(sf_dir)
        lsn = env["source"].combine_chunks().field("lsn")
        maxl = int(pc.max(lsn).as_py())
        H, H2 = maxl // 3, (2 * maxl) // 3
        root = EC.scratch_dir("incsnap")
        binlog, lake = os.path.join(root, "binlog"), os.path.join(root, "lake")
        EC.write_env_binlog(
            env.filter(pc.and_(pc.greater(lsn, H), pc.less_equal(lsn, H2))),
            binlog,
        )
        pos = {"v": H2, "wave2": False}
        total = EC.snapshot_source(sf_dir, H2).num_rows
        chunk_rows = max(1, total // 4 + 1)

        def chunk_source(last_key, n):
            # DB state as of the current commit position
            state = EC.snapshot_source(sf_dir, pos["v"]).sort_by(
                [("user_id", "ascending")]
            )
            if last_key is not None:
                state = state.filter(pc.greater(state["user_id"], last_key))
            chunk = state.slice(0, n)
            if not pos["wave2"]:
                # wave 2 commits right after this read — the next drain
                # picks it up and newer events must beat older chunk rows
                EC.write_env_binlog(
                    env.filter(pc.greater(lsn, H2)), binlog, append=True
                )
                pos["v"], pos["wave2"] = maxl, True
            return chunk

        eng = EC.make_engine(lake)
        eng.snapshot_incremental(chunk_source, binlog, chunk_rows=chunk_rows)
        return eng.lake_table()

    def cdc_latest_only(sf_dir):
        """latest-only mode (CommitLogProcessor.java:115-134): only the
        newest not-yet-applied segment per binlog partition is processed;
        older segments are marked done without applying."""
        import pyarrow as pa
        from debezium_incubator_ray import schema as S
        from debezium_incubator_ray.config import EngineConfig
        from debezium_incubator_ray.pipelines.cdc import CdcEngine
        from debezium_incubator_ray.pipelines.events_cdc import (
            EVENTS_PAYLOAD, NUM_PARTITIONS as P, scratch_dir, write_events_binlog,
        )

        root = scratch_dir("latest")
        binlog, lake = os.path.join(root, "binlog"), os.path.join(root, "lake")
        write_events_binlog(sf_dir, binlog)  # seg_rows=4096, per-partition
        cfg = EngineConfig(
            table="events", key="user_id", num_partitions=P, partitioner="mod",
            apply_concurrency=4, target_rows_per_file=100_000, latest_only=True,
        )
        eng = CdcEngine(lake, cfg, payload_schema=EVENTS_PAYLOAD)
        eng.run(binlog)
        out = eng.lake_table(include_lsn=True)
        i = out.schema.get_field_index(S.LSN)
        return out.set_column(i, pa.field("lsn", pa.int64()), out[S.LSN])

    def cdc_tombstone_retain(sf_dir):
        """tombstones=False: deleted keys retained as marker rows (payload
        nulls + deleted flag) — the compacted-topic-without-tombstone
        contract (TombstoneRecord.java:11-24 inverted)."""
        import pyarrow as pa
        from debezium_incubator_ray import schema as S
        from debezium_incubator_ray.envelope import DELETED
        from debezium_incubator_ray.pipelines.events_cdc import (
            make_engine, scratch_dir, write_events_binlog,
        )

        root = scratch_dir("tbret")
        binlog, lake = os.path.join(root, "binlog"), os.path.join(root, "lake")
        write_events_binlog(sf_dir, binlog)
        eng = make_engine(lake, tombstones=False)
        eng.run(binlog)
        out = eng.lake_table(include_lsn=True)
        i = out.schema.get_field_index(S.LSN)
        out = out.set_column(i, pa.field("lsn", pa.int64()), out[S.LSN])
        i = out.schema.get_field_index(DELETED)
        return out.set_column(i, pa.field("deleted", pa.bool_()), out[DELETED])

    def cdc_tombstone_purge(sf_dir):
        """gc-grace purge: retained tombstone markers older than the
        horizon (half the stream) are garbage-collected; younger markers
        and live rows survive — Cassandra's gc_grace_seconds contract."""
        import pyarrow as pa
        import pyarrow.compute as pc
        from debezium_incubator_ray import schema as S
        from debezium_incubator_ray.envelope import DELETED
        from debezium_incubator_ray.pipelines.events_cdc import (
            make_engine, scratch_dir, write_events_binlog,
        )

        root = scratch_dir("tbpurge")
        binlog, lake = os.path.join(root, "binlog"), os.path.join(root, "lake")
        env = write_events_binlog(sf_dir, binlog)
        eng = make_engine(lake, tombstones=False)
        eng.run(binlog)
        mid = int(
            pc.max(env["source"].combine_chunks().field("lsn")).as_py()
        ) // 2
        eng.purge_tombstones(upto_lsn=mid)
        out = eng.lake_table(include_lsn=True)
        i = out.schema.get_field_index(S.LSN)
        out = out.set_column(i, pa.field("lsn", pa.int64()), out[S.LSN])
        i = out.schema.get_field_index(DELETED)
        return out.set_column(i, pa.field("deleted", pa.bool_()), out[DELETED])

    # -- supplementary relational/type operators ---------------------------

    def type_normalization(sf_dir):
        import ray.data
        from debezium_incubator_ray.functions import typeconv as TC

        ds = ray.data.read_parquet(
            os.path.join(sf_dir, "lineitem.parquet"),
            columns=["l_orderkey", "l_linenumber", "l_quantity", "l_tax", "l_shipdate"],
        )

        def conv(t):
            import pyarrow as pa

            qty_int = TC.floor_to_int64(t["l_quantity"])
            return pa.table(
                {
                    "l_orderkey": t["l_orderkey"],
                    "l_linenumber": t["l_linenumber"],
                    "qty_int": qty_int,
                    "qty_i16": TC.narrow_int_by_width(qty_int, 4),
                    "tax_f32": TC.float_narrow(t["l_tax"]),
                    "ship_ms": TC.timestamp_to_epoch_ms(t["l_shipdate"]),
                    "ship_iso": TC.timestamp_to_iso_string(t["l_shipdate"]),
                }
            )

        return ds.map_batches(conv, batch_format="pyarrow", zero_copy_batch=True)

    def type_normalization_ltz(sf_dir):
        """TIMESTAMP WITH LOCAL TIME ZONE rule at the gate: the reference
        does NOT support LTZ — every value converts to NULL while the
        field stays in the schema (OracleValueConverters.java:71-73,
        388-390). The events.ts column is treated as an LTZ read; the
        oracle is the rule itself (typed NULL per row). An exact
        epoch-us column rides along so the row set is still
        non-trivially pinned."""
        import warnings

        import ray.data
        from debezium_incubator_ray.functions import typeconv as TC

        ds = ray.data.read_parquet(
            os.path.join(sf_dir, "events.parquet"),
            columns=["event_id", "ts"],
        )

        def conv(t):
            import pyarrow as pa

            with warnings.catch_warnings():
                warnings.simplefilter("ignore", UserWarning)
                ltz = TC.timestamp_ltz_unsupported(t["ts"])
            return pa.table({
                "event_id": t["event_id"],
                "ts_ltz": ltz,
                "ts_us": TC.timestamp_to_epoch_us(t["ts"]),
            })

        return ds.map_batches(conv, batch_format="pyarrow", zero_copy_batch=True)

    def type_normalization_nested(sf_dir):
        """Nested/collection conversion rules (P10 breadth): set→sorted
        array, map key stringification, uuid→fixed(16), duration struct,
        INTERVAL regex kernels, decimal scale-pad + VariableScaleDecimal —
        each exercised mid-pipeline with scalar outputs the oracle can
        recompute (golden-value pinning like
        CassandraTypeDeserializerTest.java:72-447)."""
        import numpy as np
        import pyarrow as pa
        import pyarrow.compute as pc
        import ray.data
        from debezium_incubator_ray.functions import typeconv as TC
        from debezium_incubator_ray.functions.tokens import token_lists

        ds = ray.data.read_parquet(
            os.path.join(sf_dir, "documents.parquet"),
            columns=["doc_id", "text", "lang", "n_chars"],
        )

        def conv(t: pa.Table) -> pa.Table:
            n = t.num_rows
            doc_id = t["doc_id"].combine_chunks()
            n_chars = t["n_chars"].combine_chunks()
            # set → sorted distinct array (SetTypeDeserializer.java:22-25)
            toks = token_lists(t["text"].combine_chunks())
            sset = TC.set_to_sorted_list(toks)
            lens = pc.list_value_length(sset).to_numpy(zero_copy_only=False)
            flat = sset.flatten()
            off = np.zeros(n, dtype=np.int64)
            np.cumsum(lens[:-1], out=off[1:])
            first = pc.take(flat, pa.array(np.minimum(off, max(len(flat) - 1, 0))))
            first = pc.if_else(pa.array(lens > 0), first, pa.nulls(n, flat.type))
            # map with non-string keys → stringified (MapTypeDeserializer)
            moff = pa.array(np.arange(n + 1, dtype=np.int32))
            m = pa.MapArray.from_arrays(moff, doc_id, t["lang"].combine_chunks())
            ms = TC.map_stringify_keys(m)
            # uuid digits-only construction (both engines can derive it)
            did = pc.cast(doc_id, pa.string())
            nch = pc.cast(n_chars, pa.string())
            uuid_str = pc.binary_join_element_wise(
                pc.utf8_lpad(did, 8, "0"),
                pa.scalar("-0000-4000-8000-"),
                pc.utf8_lpad(nch, 12, "0"),
                pa.scalar(""),
            )
            ub = TC.uuid_to_fixed16(uuid_str)
            # hex back out, vectorized (numpy nibble LUT)
            raw = np.frombuffer(ub.buffers()[1], dtype=np.uint8)[: n * 16]
            lut = np.frombuffer(b"0123456789abcdef", dtype=np.uint8)
            hx = np.empty(n * 32, dtype=np.uint8)
            hx[0::2] = lut[raw >> 4]
            hx[1::2] = lut[raw & 0xF]
            uuid_hex = pa.array(
                hx.reshape(n, 32).view(f"S32").reshape(n).astype("U32")
            )
            # duration record (CassandraTypeToAvroSchemaMapper.java:37-41);
            # pyarrow 16 has no modulo kernel — numpy on the int64 view
            dnp = doc_id.to_numpy()
            dur = TC.duration_to_struct(
                pa.array(dnp % 24), pa.array(dnp % 31),
                pc.multiply(n_chars, 1000),
            )
            # INTERVAL kernels (OracleValueConverters.java:392-441)
            dts = pc.binary_join_element_wise(
                pc.cast(pa.array(dnp % 5), pa.string()),
                pa.scalar(" 12:34:"),
                pc.utf8_lpad(pc.cast(pa.array(dnp % 60), pa.string()), 2, "0"),
                pa.scalar(""),
            )
            ym = pc.binary_join_element_wise(
                pc.cast(pa.array(dnp % 9), pa.string()),
                pa.scalar("-"),
                pc.cast(pa.array(dnp % 12), pa.string()),
                pa.scalar(""),
            )
            # decimal scale-pad + VariableScaleDecimal
            dec = TC.decimal_scale_pad(
                pc.divide(pc.cast(n_chars, pa.float64()), 8.0), 12, 6
            )
            vsd = TC.variable_scale_decimal(dec)
            return pa.table(
                {
                    "doc_id": doc_id,
                    "n_distinct_toks": pc.cast(pa.array(lens), pa.int64()),
                    "first_tok": first,
                    "map_key0": ms.keys,
                    "map_val0": ms.items,
                    "uuid_hex": uuid_hex,
                    "dur_months": dur.field("months"),
                    "dur_days": dur.field("days"),
                    "dur_nanos": dur.field("nanos"),
                    "ivl_micros": TC.interval_dts_to_micros(dts),
                    "ym_months": TC.interval_ym_to_months(ym),
                    "dec_str": pc.cast(dec, pa.string()),
                    "vsd_scale": vsd.field("scale"),
                    "vsd_value": vsd.field("value"),
                }
            )

        return ds.map_batches(conv, batch_format="pyarrow", zero_copy_batch=True)

    def row_scoped_max(sf_dir):
        import pyarrow as pa
        import pyarrow.compute as pc
        import ray.data

        ds = ray.data.read_parquet(
            os.path.join(sf_dir, "lineitem.parquet"),
            columns=["l_orderkey", "l_linenumber", "l_tax", "l_discount"],
        )

        def mx(t):
            return pa.table(
                {
                    "l_orderkey": t["l_orderkey"],
                    "l_linenumber": t["l_linenumber"],
                    "writetime_max": pc.max_element_wise(t["l_tax"], t["l_discount"]),
                }
            )

        return ds.map_batches(mx, batch_format="pyarrow", zero_copy_batch=True)

    def agg_presum_groupby(sf_dir):
        """Partial-aggregate-then-small-groupby (the scale pattern for A-ops:
        combine inside map_batches, shuffle only one row per key per block)."""
        import pyarrow as pa
        import ray.data
        from ray.data.aggregate import Sum

        ds = ray.data.read_parquet(
            os.path.join(sf_dir, "events.parquet"), columns=["event_type", "value"]
        )

        def partial(t: pa.Table) -> pa.Table:
            import pyarrow.compute as pc

            g = t.group_by("event_type").aggregate([("value", "sum"), ("value", "count")])
            return pa.table(
                {
                    "event_type": g["event_type"],
                    "psum": g["value_sum"],
                    "pn": pc.cast(g["value_count"], pa.int64()),
                }
            )

        partials = ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
        out = partials.groupby("event_type").aggregate(
            Sum("psum", alias_name="total_value"), Sum("pn", alias_name="n")
        )

        def stabilize(t: pa.Table) -> pa.Table:
            import pyarrow.compute as pc

            # float sums are order-dependent; round to a stable precision so
            # the partial-sum tree matches the oracle's sequential sum
            return t.set_column(
                t.schema.get_field_index("total_value"),
                "total_value",
                pc.round(t["total_value"], ndigits=3),
            )

        return out.map_batches(stabilize, batch_format="pyarrow")

    def windowed_agg(sf_dir):
        """Tumbling 1-hour event-time window aggregate (count + sum per
        (window, event_type)). Ray Data has no event-time windows; the
        window id is a vectorized floor(ts / size) column and the aggregate
        is the partial-then-small-groupby combiner pattern — the documented
        partitioning assumption is ts-derived keys, not arrival order."""
        import pyarrow as pa
        import pyarrow.compute as pc
        import ray.data
        from ray.data.aggregate import Sum

        ds = ray.data.read_parquet(
            os.path.join(sf_dir, "events.parquet"), columns=["ts", "event_type", "value"]
        )
        HOUR_US = 3600 * 1_000_000

        def partial(t: pa.Table) -> pa.Table:
            w = pc.divide(pc.cast(t["ts"], pa.int64()), HOUR_US)
            t2 = pa.table(
                {"window": w, "event_type": t["event_type"], "value": t["value"]}
            )
            g = t2.group_by(["window", "event_type"]).aggregate(
                [("value", "sum"), ("value", "count")]
            )
            return pa.table(
                {
                    "window": g["window"],
                    "event_type": g["event_type"],
                    "psum": g["value_sum"],
                    "pn": pc.cast(g["value_count"], pa.int64()),
                }
            )

        out = (
            ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
            .groupby(["window", "event_type"])
            .aggregate(Sum("psum", alias_name="total_value"), Sum("pn", alias_name="n"))
        )

        def stabilize(t: pa.Table) -> pa.Table:
            import pyarrow.compute as pc2

            return t.set_column(
                t.schema.get_field_index("total_value"),
                "total_value",
                pc2.round(t["total_value"], ndigits=3),
            )

        return out.map_batches(stabilize, batch_format="pyarrow")

    # -- training-data operators -------------------------------------------

    def windowed_session_agg(sf_dir):
        """Gap-based session windows (30-min inactivity gap per user):
        one row per session with start/end/count/sum."""
        import ray.data
        from debezium_incubator_ray.functions.windows import sessionize

        ds = ray.data.read_parquet(
            os.path.join(sf_dir, "events.parquet"),
            columns=["user_id", "ts", "value"],
        )
        return sessionize(ds)

    def events_conversion_window(sf_dir):
        """Sliding-window self-join WITHOUT pair materialization: per
        user, every (view, purchase) pair with the purchase 0 < dt <= 24h
        after the view — counts and min/max delays come from binary-search
        span endpoints inside one hash(key) bucketed shuffle (as-of join
        keeps only the nearest match; this aggregates ALL matches)."""
        import pyarrow as pa
        import ray.data
        from debezium_incubator_ray.functions.windows import (
            window_pair_stats,
        )

        ds = ray.data.read_parquet(
            os.path.join(sf_dir, "events.parquet"),
            columns=["user_id", "ts", "event_type"],
        )
        out = window_pair_stats(
            ds, "user_id", "ts", "event_type", "view", "purchase",
            window_us=24 * 3600 * 1_000_000, buckets=32,
        )
        return out.map_batches(
            lambda t: t.rename_columns(
                ["user_id", "n_pairs", "min_delay_us", "max_delay_us"]
            ),
            batch_format="pyarrow",
        )

    def events_rolling_distinct(sf_dir):
        """Trailing-7-day COUNT(DISTINCT user) per day: bounded x7
        expansion collapsed by block-local distinct, one hash(id) shuffle
        for global distinctness, metadata-sized day fold."""
        import ray.data
        from debezium_incubator_ray.functions.windows import (
            rolling_distinct,
        )

        ds = ray.data.read_parquet(
            os.path.join(sf_dir, "events.parquet"),
            columns=["ts", "user_id"],
        )
        return rolling_distinct(ds, "ts", "user_id", window_days=7,
                                buckets=32)

    def events_stickiness(sf_dir):
        """DAU/WAU stickiness per day from ONE pass: the rolling-distinct
        shuffle's own-day flag doubles as the daily distinct count, so
        the trailing-7-day WAU and the day's DAU (and their ratio) come
        from the same expanded-pair shuffle."""
        import pyarrow as pa
        import pyarrow.compute as pc
        import ray.data
        from debezium_incubator_ray.functions.windows import (
            rolling_distinct,
        )

        ds = ray.data.read_parquet(
            os.path.join(sf_dir, "events.parquet"),
            columns=["ts", "user_id"],
        )
        out = rolling_distinct(ds, "ts", "user_id", window_days=7,
                               buckets=32, include_daily=True)

        def ratio(t: pa.Table) -> pa.Table:
            return pa.table({
                "day": t["day"],
                "dau": t["n_ids_day"],
                "wau": t["n_ids"],
                "stickiness": pc.round(
                    pc.divide(
                        pc.cast(t["n_ids_day"], pa.float64()),
                        pc.cast(t["n_ids"], pa.float64()),
                    ),
                    ndigits=6,
                ),
            })

        return out.map_batches(ratio, batch_format="pyarrow")

    def stats_spearman(sf_dir):
        """Spearman rank correlation of lineitem quantity vs discount:
        tie-average rank maps fold from distinct-value counts (shuffle
        + broadcast bounded by the distinct count, not rows), one
        streaming Pearson-moment pass."""
        import ray.data
        from debezium_incubator_ray.functions.stats import spearman_corr

        li = ray.data.read_parquet(
            os.path.join(sf_dir, "lineitem.parquet"),
            columns=["l_quantity", "l_discount"],
        )
        return spearman_corr(li, "l_quantity", "l_discount")

    def stats_ks_test(sf_dir):
        """Two-sample Kolmogorov-Smirnov: does l_quantity distribute the
        same for open ('O') vs fulfilled ('F') line items? Per-block
        distinct-value count partials, one narrow groupby, driver finish
        bounded by the distinct count (50 quantities)."""
        import ray.data
        from debezium_incubator_ray.functions.stats import ks_two_sample

        li = ray.data.read_parquet(
            os.path.join(sf_dir, "lineitem.parquet"),
            columns=["l_quantity", "l_linestatus"],
        )
        return ks_two_sample(li, "l_quantity", "l_linestatus", "O", "F")

    def orders_value_gini(sf_dir):
        """Gini of order VALUE (o_totalprice) — revenue inequality, the
        sibling of events_gini's activity inequality. Cent-grid
        value-counts fold (shuffle + driver bounded by distinct cent
        values, a fixed price grid at any scale); exact integer rank-sum
        formula on the driver."""
        import ray.data
        from debezium_incubator_ray.functions.stats import value_gini

        ds = ray.data.read_parquet(
            os.path.join(sf_dir, "orders.parquet"),
            columns=["o_totalprice"],
        )
        return value_gini(ds, "o_totalprice")

    def lineitem_q6_revenue(sf_dir):
        """The classic TPC-H Q6 pruned-scan aggregate: forecast-revenue
        change = sum(extendedprice * discount) over a discount band and
        quantity cap. Columns pruned at the read; per-batch partial sums
        in exact CENTS x BASIS-POINTS int64 (floats would drift vs the
        oracle's sum order); one tiny driver fold."""
        import numpy as np
        import pyarrow as pa
        import pyarrow.compute as pc
        import ray.data

        ds = ray.data.read_parquet(
            os.path.join(sf_dir, "lineitem.parquet"),
            columns=["l_extendedprice", "l_discount", "l_quantity"],
        )

        def partial(t: pa.Table) -> pa.Table:
            disc = t["l_discount"].combine_chunks()
            qty = t["l_quantity"].combine_chunks()
            keep = pc.and_(
                pc.and_(pc.greater_equal(disc, 0.05),
                        pc.less_equal(disc, 0.07)),
                pc.less(qty, 24.0),
            )
            t = t.filter(keep)
            price_c = pc.cast(
                pc.round(pc.multiply(t["l_extendedprice"], 100.0)),
                pa.int64(),
            ).to_numpy(zero_copy_only=False)
            disc_bp = pc.cast(
                pc.round(pc.multiply(t["l_discount"], 100.0)), pa.int64()
            ).to_numpy(zero_copy_only=False)
            return pa.table({
                "s": pa.array([int((price_c * disc_bp).sum())], pa.int64()),
                "n": pa.array([t.num_rows], pa.int64()),
            })

        rows = ds.map_batches(
            partial, batch_format="pyarrow", zero_copy_batch=True
        ).take_all()  # one (s, n) row per block
        s = sum(r["s"] for r in rows)
        n = sum(r["n"] for r in rows)
        return pa.table({
            "revenue": pa.array([round(s / 10_000.0, 2)], pa.float64()),
            "n": pa.array([n], pa.int64()),
        })

    def lineitem_q1_pricing(sf_dir):
        """The TPC-H Q1 pricing summary: per (returnflag, linestatus)
        sums of quantity / base price / discounted price / charge plus
        the three means, over shipdate <= the cutoff. All money math in
        exact int64 CENTS x BASIS-POINTS (floats would drift vs the
        oracle's sum order; at true 100-TB row counts the partials
        would move to decimal128 — the per-group per-batch fold shape
        is unchanged). Per-batch group partials pre-reduce before one
        tiny 6-row groupby."""
        import numpy as np
        import pyarrow as pa
        import pyarrow.compute as pc
        import ray.data
        from ray.data.aggregate import Sum

        CUTOFF = np.datetime64("2000-09-02T00:00:00", "us").astype(
            np.int64
        )
        ds = ray.data.read_parquet(
            os.path.join(sf_dir, "lineitem.parquet"),
            columns=["l_returnflag", "l_linestatus", "l_quantity",
                     "l_extendedprice", "l_discount", "l_tax",
                     "l_shipdate"],
        )

        def partial(t: pa.Table) -> pa.Table:
            ship = t["l_shipdate"].combine_chunks().cast(
                pa.int64()
            ).to_numpy(zero_copy_only=False)
            t = t.filter(pa.array(ship <= CUTOFF))
            if t.num_rows == 0:
                return pa.table({
                    "l_returnflag": pa.array([], pa.string()),
                    "l_linestatus": pa.array([], pa.string()),
                    "qty_c": pa.array([], pa.int64()),
                    "price_c": pa.array([], pa.int64()),
                    "disc_cbp": pa.array([], pa.int64()),
                    "charge_cbp2": pa.array([], pa.int64()),
                    "disc_bp": pa.array([], pa.int64()),
                    "n": pa.array([], pa.int64()),
                })

            def cents(col, scale):
                return pc.cast(
                    pc.round(pc.multiply(t[col], scale)), pa.int64()
                ).to_numpy(zero_copy_only=False)

            qty_c = cents("l_quantity", 100.0)
            price_c = cents("l_extendedprice", 100.0)
            disc_bp = cents("l_discount", 100.0)
            tax_bp = cents("l_tax", 100.0)
            disc_price = price_c * (100 - disc_bp)
            charge = disc_price * (100 + tax_bp)
            part = pa.table({
                "l_returnflag": t["l_returnflag"],
                "l_linestatus": t["l_linestatus"],
                "qty_c": pa.array(qty_c),
                "price_c": pa.array(price_c),
                "disc_cbp": pa.array(disc_price),
                "charge_cbp2": pa.array(charge),
                "disc_bp": pa.array(disc_bp),
                "n": pa.array(np.ones(t.num_rows, np.int64)),
            }).group_by(["l_returnflag", "l_linestatus"]).aggregate(
                [("qty_c", "sum"), ("price_c", "sum"),
                 ("disc_cbp", "sum"), ("charge_cbp2", "sum"),
                 ("disc_bp", "sum"), ("n", "sum")]
            )
            return pa.table({
                "l_returnflag": part["l_returnflag"],
                "l_linestatus": part["l_linestatus"],
                "qty_c": part["qty_c_sum"],
                "price_c": part["price_c_sum"],
                "disc_cbp": part["disc_cbp_sum"],
                "charge_cbp2": part["charge_cbp2_sum"],
                "disc_bp": part["disc_bp_sum"],
                "n": part["n_sum"],
            })

        g = (
            ds.map_batches(partial, batch_format="pyarrow",
                           zero_copy_batch=True)
            .groupby(["l_returnflag", "l_linestatus"])
            .aggregate(Sum("qty_c", alias_name="qty_c"),
                       Sum("price_c", alias_name="price_c"),
                       Sum("disc_cbp", alias_name="disc_cbp"),
                       Sum("charge_cbp2", alias_name="charge_cbp2"),
                       Sum("disc_bp", alias_name="disc_bp"),
                       Sum("n", alias_name="n"))
        )
        from debezium_incubator_ray.functions.kernels import collect_table

        t = collect_table(g, empty=pa.table({
            "l_returnflag": pa.array([], pa.string()),
            "l_linestatus": pa.array([], pa.string()),
            "qty_c": pa.array([], pa.int64()),
            "price_c": pa.array([], pa.int64()),
            "disc_cbp": pa.array([], pa.int64()),
            "charge_cbp2": pa.array([], pa.int64()),
            "disc_bp": pa.array([], pa.int64()),
            "n": pa.array([], pa.int64()),
        }))
        idx = pc.sort_indices(t, sort_keys=[
            ("l_returnflag", "ascending"), ("l_linestatus", "ascending"),
        ])
        t = t.take(idx)
        # exact HALF-AWAY rounding in integer space (Python ints — no
        # int64 ceiling, no float half-edge divergence vs the oracle):
        # sums land on exact 2dp/6dp grids, so float round() would
        # tie-break differently than DuckDB on knife-edge halves
        n = [int(v) for v in t["n"].to_pylist()]
        qty = [int(v) for v in t["qty_c"].to_pylist()]
        price = [int(v) for v in t["price_c"].to_pylist()]
        disc_p = [int(v) for v in t["disc_cbp"].to_pylist()]
        charge = [int(v) for v in t["charge_cbp2"].to_pylist()]
        disc = [int(v) for v in t["disc_bp"].to_pylist()]

        def cents2(vals, scale):
            # value = v / scale dollars, rounded half-away to 2dp:
            # (v + half-of-last-kept-unit) // (scale/100) gives cents
            return pa.array(
                [(v + scale // 200) // (scale // 100) / 100.0
                 if scale > 100 else v / 100.0 for v in vals],
                pa.float64(),
            )

        def mean6(svals, sunit):
            # mean = s / (sunit * n), rounded half-away to 6dp, exact
            return pa.array(
                [((2_000_000 * s // sunit) + nn) // (2 * nn) / 1e6
                 for s, nn in zip(svals, n)],
                pa.float64(),
            )

        return pa.table({
            "l_returnflag": t["l_returnflag"],
            "l_linestatus": t["l_linestatus"],
            "sum_qty": cents2(qty, 100),
            "sum_base_price": cents2(price, 100),
            "sum_disc_price": cents2(disc_p, 10_000),
            "sum_charge": cents2(charge, 1_000_000),
            "avg_qty": mean6(qty, 100),
            "avg_price": mean6(price, 100),
            "avg_disc": mean6(disc, 100),
            "count_order": t["n"],
        })

    def join_q3_shipping(sf_dir):
        """The TPC-H Q3 shape: top-10 unshipped-at-cutoff orders of the
        BUILDING segment by discounted lineitem revenue. The two small
        sides reduce BEFORE touching lineitem: segment custkeys fold to
        a sorted id array, qualifying orders to parallel arrays — both
        broadcast ONCE via ray.put (at lake scale the order side would
        cut over to the shared shuffle join; this is the documented
        broadcast path). Lineitem revenue folds per batch per orderkey
        in exact cents x bp, one narrow groupby, per-block top-k
        partials, k x blocks rows to the driver."""
        import numpy as np
        import pyarrow as pa
        import pyarrow.compute as pc
        import ray
        import ray.data
        from ray.data.aggregate import Sum

        D = np.datetime64("2000-03-15T00:00:00", "us").astype(np.int64)

        cust = ray.data.read_parquet(
            os.path.join(sf_dir, "customer.parquet"),
            columns=["c_custkey", "c_mktsegment"],
        )

        def cust_part(t: pa.Table) -> pa.Table:
            keep = pc.equal(t["c_mktsegment"], "BUILDING")
            return t.filter(keep).select(["c_custkey"])

        from debezium_incubator_ray.functions.kernels import collect_table

        ct = collect_table(cust.map_batches(
            cust_part, batch_format="pyarrow", zero_copy_batch=True
        ), empty=pa.table({"c_custkey": pa.array([], pa.int64())}))
        ckeys = np.sort(
            ct["c_custkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        )
        ckeys_ref = ray.put(ckeys)

        orders = ray.data.read_parquet(
            os.path.join(sf_dir, "orders.parquet"),
            columns=["o_orderkey", "o_custkey", "o_orderdate",
                     "o_orderpriority"],
        )

        def ord_part(t: pa.Table) -> pa.Table:
            ck = ray.get(ckeys_ref)
            if len(ck) == 0:
                return t.slice(0, 0).select(
                    ["o_orderkey", "o_orderdate", "o_orderpriority"]
                )
            od = t["o_orderdate"].combine_chunks().cast(
                pa.int64()
            ).to_numpy(zero_copy_only=False)
            oc = t["o_custkey"].combine_chunks().to_numpy(
                zero_copy_only=False
            )
            pos = np.searchsorted(ck, oc)
            pos[pos == len(ck)] = 0
            keep = (od < D) & (ck[pos] == oc)
            return t.filter(pa.array(keep)).select(
                ["o_orderkey", "o_orderdate", "o_orderpriority"]
            )

        ot = collect_table(orders.map_batches(
            ord_part, batch_format="pyarrow", zero_copy_batch=True
        ), empty=pa.table({
            "o_orderkey": pa.array([], pa.int64()),
            "o_orderdate": pa.array([], pa.timestamp("us")),
            "o_orderpriority": pa.array([], pa.string()),
        }))
        okeys = ot["o_orderkey"].to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        order_o = np.argsort(okeys)
        okeys = okeys[order_o]
        odates = ot["o_orderdate"].combine_chunks().cast(pa.int64()) \
            .to_numpy(zero_copy_only=False)[order_o] \
            .astype("datetime64[us]")
        oprios = np.array(
            ot["o_orderpriority"].to_pylist(), object
        )[order_o]
        okeys_ref = ray.put(okeys)

        li = ray.data.read_parquet(
            os.path.join(sf_dir, "lineitem.parquet"),
            columns=["l_orderkey", "l_extendedprice", "l_discount",
                     "l_shipdate"],
        )

        def li_part(t: pa.Table) -> pa.Table:
            ok = ray.get(okeys_ref)
            if len(ok) == 0:
                return pa.table({
                    "o_orderkey": pa.array([], pa.int64()),
                    "rev": pa.array([], pa.int64()),
                })
            ship = t["l_shipdate"].combine_chunks().cast(
                pa.int64()
            ).to_numpy(zero_copy_only=False)
            lo = t["l_orderkey"].combine_chunks().to_numpy(
                zero_copy_only=False
            )
            pos = np.searchsorted(ok, lo)
            pos[pos == len(ok)] = 0
            keep = (ship > D) & (ok[pos] == lo)
            t = t.filter(pa.array(keep))
            if t.num_rows == 0:
                return pa.table({
                    "o_orderkey": pa.array([], pa.int64()),
                    "rev": pa.array([], pa.int64()),
                })
            price_c = pc.cast(
                pc.round(pc.multiply(t["l_extendedprice"], 100.0)),
                pa.int64(),
            ).to_numpy(zero_copy_only=False)
            disc_bp = pc.cast(
                pc.round(pc.multiply(t["l_discount"], 100.0)), pa.int64()
            ).to_numpy(zero_copy_only=False)
            part = pa.table({
                "o_orderkey": t["l_orderkey"],
                "rev": pa.array(price_c * (100 - disc_bp)),
            }).group_by("o_orderkey").aggregate([("rev", "sum")])
            return pa.table({"o_orderkey": part["o_orderkey"],
                             "rev": part["rev_sum"]})

        from debezium_incubator_ray.functions.kernels import (
            merge_local_topk, table_topk,
        )

        per_order = (
            li.map_batches(li_part, batch_format="pyarrow",
                           zero_copy_batch=True)
            .groupby("o_orderkey")
            .aggregate(Sum("rev", alias_name="rev"))
        )

        def topk_part(t: pa.Table) -> pa.Table:
            # round half-away to 2dp in INT space BEFORE the top-k (the
            # oracle orders by the rounded value; cents grid halves
            # would tie-break differently in float)
            rev = t["rev"].combine_chunks().to_numpy(
                zero_copy_only=False
            )
            out = pa.table({
                "o_orderkey": t["o_orderkey"],
                "revenue": pa.array(((rev + 50) // 100) / 100.0),
            })
            return table_topk(out, "revenue", ["o_orderkey"], 10)

        cand = per_order.map_batches(topk_part, batch_format="pyarrow",
                                     zero_copy_batch=True)
        empty = pa.table({"o_orderkey": pa.array([], pa.int64()),
                          "revenue": pa.array([], pa.float64())})
        top = merge_local_topk(cand, "revenue", ["o_orderkey"], 10, empty)
        order = pc.sort_indices(
            top.append_column("_neg", pc.negate(top["revenue"])),
            sort_keys=[("_neg", "ascending"), ("o_orderkey", "ascending")],
        )
        top = top.take(order)
        kk = top["o_orderkey"].to_numpy(zero_copy_only=False)
        pos = np.searchsorted(okeys, kk)
        days = np.datetime_as_string(odates[pos].astype("datetime64[D]"))
        return pa.table({
            "o_orderkey": top["o_orderkey"],
            "revenue": top["revenue"],  # already exact-2dp rounded
            "order_day": pa.array(list(days), pa.string()),
            "o_orderpriority": pa.array(list(oprios[pos]), pa.string()),
        })

    def stats_cramers_v(sf_dir):
        """Cramér's V between document language and source — the
        bias-unadjusted effect size on the lang x source contingency
        grid (chi2 exists on events; this is association STRENGTH on
        the corpus mix, the quantity a curation run actually tracks).
        Exact integer cell counts fold per batch; the driver finish is
        the r x c grid (tens of cells), zero-observed cells included."""
        import numpy as np
        import pyarrow as pa
        import ray.data
        from ray.data.aggregate import Sum

        ds = ray.data.read_parquet(
            os.path.join(sf_dir, "documents.parquet"),
            columns=["lang", "source"],
        )

        def partial(t: pa.Table) -> pa.Table:
            import pyarrow.compute as pc

            t = t.filter(pc.and_(pc.is_valid(t["lang"]),
                                 pc.is_valid(t["source"])))
            part = t.append_column(
                "n", pa.array(np.ones(t.num_rows, np.int64))
            ).group_by(["lang", "source"]).aggregate([("n", "sum")])
            return pa.table({"lang": part["lang"],
                             "source": part["source"],
                             "n": part["n_sum"]})

        rows = (
            ds.map_batches(partial, batch_format="pyarrow",
                           zero_copy_batch=True)
            .groupby(["lang", "source"])
            .aggregate(Sum("n", alias_name="n"))
            .take_all()
        )  # r x c cells — tiny
        langs = sorted({r["lang"] for r in rows})
        srcs = sorted({r["source"] for r in rows})
        grid = np.zeros((len(langs), len(srcs)), np.int64)
        li = {v: i for i, v in enumerate(langs)}
        si = {v: i for i, v in enumerate(srcs)}
        for r in rows:
            grid[li[r["lang"]], si[r["source"]]] = r["n"]
        n = grid.sum()
        rn = grid.sum(axis=1, keepdims=True).astype(np.float64)
        cn = grid.sum(axis=0, keepdims=True).astype(np.float64)
        E = rn * cn / n
        chi2 = float(((grid - E) ** 2 / E).sum())
        kmin = min(len(langs), len(srcs)) - 1
        v = float(np.sqrt(chi2 / (n * kmin)))
        return pa.table({
            "chi2": pa.array([round(chi2, 6)], pa.float64()),
            "cramers_v": pa.array([round(v, 6)], pa.float64()),
            "n": pa.array([int(n)], pa.int64()),
            "n_lang": pa.array([len(langs)], pa.int64()),
            "n_source": pa.array([len(srcs)], pa.int64()),
        })

    def stats_cohens_d(sf_dir):
        """Cohen's d (pooled-SD effect size) + Hedges' g correction for
        l_quantity between returnflag A and R — the standardized
        mean-difference companion to the Welch row (which tests; this
        SIZES). Quantities fold as exact int64 cents power sums
        (sum, sum-of-squares); the variance algebra is stated
        identically on both sides so rounding agrees."""
        import numpy as np
        import pyarrow as pa
        import pyarrow.compute as pc
        import ray.data
        from ray.data.aggregate import Sum

        ds = ray.data.read_parquet(
            os.path.join(sf_dir, "lineitem.parquet"),
            columns=["l_returnflag", "l_quantity"],
        )

        def partial(t: pa.Table) -> pa.Table:
            t = t.filter(pc.is_in(t["l_returnflag"],
                                  value_set=pa.array(["A", "R"])))
            if t.num_rows == 0:
                return pa.table({
                    "g": pa.array([], pa.string()),
                    "s": pa.array([], pa.int64()),
                    "ss": pa.array([], pa.int64()),
                    "n": pa.array([], pa.int64()),
                })
            q = pc.cast(
                pc.round(pc.multiply(t["l_quantity"], 100.0)), pa.int64()
            ).to_numpy(zero_copy_only=False)
            part = pa.table({
                "g": t["l_returnflag"],
                "s": pa.array(q),
                "ss": pa.array(q * q),
                "n": pa.array(np.ones(len(q), np.int64)),
            }).group_by("g").aggregate(
                [("s", "sum"), ("ss", "sum"), ("n", "sum")]
            )
            return pa.table({"g": part["g"], "s": part["s_sum"],
                             "ss": part["ss_sum"], "n": part["n_sum"]})

        rows = (
            ds.map_batches(partial, batch_format="pyarrow",
                           zero_copy_batch=True)
            .groupby("g")
            .aggregate(Sum("s", alias_name="s"),
                       Sum("ss", alias_name="ss"),
                       Sum("n", alias_name="n"))
            .take_all()
        )
        st = {r["g"]: r for r in rows}
        if "A" not in st or "R" not in st:
            # mirror the oracle's empty cross join when a group is absent
            return pa.table({
                "n_a": pa.array([], pa.int64()),
                "n_b": pa.array([], pa.int64()),
                "mean_a": pa.array([], pa.float64()),
                "mean_b": pa.array([], pa.float64()),
                "pooled_sd": pa.array([], pa.float64()),
                "cohens_d": pa.array([], pa.float64()),
                "hedges_g": pa.array([], pa.float64()),
            })
        a, b = st["A"], st["R"]

        def mv(r):
            n = float(r["n"])
            m = r["s"] / 100.0 / n
            var = (r["ss"] / 10_000.0 - n * m * m) / (n - 1.0)
            return n, m, var

        na, ma, va = mv(a)
        nb, mb, vb = mv(b)
        sp = float(np.sqrt(
            ((na - 1.0) * va + (nb - 1.0) * vb) / (na + nb - 2.0)
        ))
        d = (ma - mb) / sp
        g = d * (1.0 - 3.0 / (4.0 * (na + nb) - 9.0))

        def mean6(r):
            # exact half-away 6dp of s / (100 n): the mean sits on a
            # rational grid where float round() can split vs the oracle
            s, nn = int(r["s"]), int(r["n"])
            return (20_000 * s + nn) // (2 * nn) / 1e6

        return pa.table({
            "n_a": pa.array([int(na)], pa.int64()),
            "n_b": pa.array([int(nb)], pa.int64()),
            "mean_a": pa.array([mean6(a)], pa.float64()),
            "mean_b": pa.array([mean6(b)], pa.float64()),
            "pooled_sd": pa.array([round(sp, 6)], pa.float64()),
            "cohens_d": pa.array([round(d, 6)], pa.float64()),
            "hedges_g": pa.array([round(g, 6)], pa.float64()),
        })

    def embedding_silhouette(sf_dir):
        """Simplified (centroid-based) silhouette per label: a = distance
        to the own-label centroid, b = min distance to any other
        centroid, s = (b - a) / max(a, b) — the standard clustering
        cohesion gauge over the labeled embedding corpus. Two streaming
        passes: a (label x dim) mean fold broadcast once, then per-batch
        vectorized distances; per-vector s rounds to 6dp and folds as
        exact MICRO-int sums per label, so the cross-batch sum order
        cannot drift vs the oracle."""
        import numpy as np
        import pyarrow as pa
        import pyarrow.compute as pc
        import ray
        import ray.data
        from ray.data.aggregate import Sum
        from debezium_incubator_ray.functions.ann import _batch_matrix

        ds = ray.data.read_parquet(
            os.path.join(sf_dir, "embeddings.parquet"),
            columns=["label", "embedding"],
        )

        def sum_partial(t: pa.Table) -> pa.Table:
            t = t.filter(pc.and_(pc.is_valid(t["embedding"]),
                                 pc.is_valid(t["label"])))
            if t.num_rows == 0:
                return pa.table({"label": pa.array([], pa.int32()),
                                 "i": pa.array([], pa.int64()),
                                 "s": pa.array([], pa.float64()),
                                 "n": pa.array([], pa.int64())})
            M = _batch_matrix(t, "embedding").astype(np.float64)
            lab = t["label"].combine_chunks().to_numpy(
                zero_copy_only=False
            )
            ulab, inv = np.unique(lab, return_inverse=True)
            sums = np.zeros((len(ulab), M.shape[1]), np.float64)
            np.add.at(sums, inv, M)
            cnt = np.bincount(inv, minlength=len(ulab)).astype(np.int64)
            k, dim = sums.shape
            return pa.table({
                "label": pa.array(np.repeat(ulab, dim)),
                "i": pa.array(np.tile(np.arange(dim, dtype=np.int64), k)),
                "s": pa.array(sums.ravel()),
                "n": pa.array(np.repeat(cnt, dim)),
            })

        cent_rows = (
            ds.map_batches(sum_partial, batch_format="pyarrow",
                           zero_copy_batch=True)
            .groupby(["label", "i"])
            .aggregate(Sum("s", alias_name="s"), Sum("n", alias_name="n"))
            .take_all()
        )  # labels x dims rows — tiny
        labels = sorted({r["label"] for r in cent_rows})
        dim = 1 + max(r["i"] for r in cent_rows)
        C = np.zeros((len(labels), dim), np.float64)
        lidx = {v: i for i, v in enumerate(labels)}
        for r in cent_rows:
            C[lidx[r["label"]], r["i"]] = r["s"] / r["n"]
        ref = ray.put((np.array(labels), C))

        def sil_partial(t: pa.Table) -> pa.Table:
            labs, cents = ray.get(ref)
            t = t.filter(pc.and_(pc.is_valid(t["embedding"]),
                                 pc.is_valid(t["label"])))
            if t.num_rows == 0:
                return pa.table({"label": pa.array([], pa.int32()),
                                 "smu": pa.array([], pa.int64()),
                                 "n": pa.array([], pa.int64())})
            M = _batch_matrix(t, "embedding").astype(np.float64)
            lab = t["label"].combine_chunks().to_numpy(
                zero_copy_only=False
            )
            # squared dists to ALL centroids: |x|^2 - 2 x.c + |c|^2
            d2 = (
                (M * M).sum(axis=1, keepdims=True)
                - 2.0 * (M @ cents.T)
                + (cents * cents).sum(axis=1)[None, :]
            )
            np.maximum(d2, 0.0, out=d2)
            dist = np.sqrt(d2)
            own_col = np.searchsorted(labs, lab)
            rows_idx = np.arange(len(lab))
            a = dist[rows_idx, own_col]
            dist[rows_idx, own_col] = np.inf
            b = dist.min(axis=1)
            s = (b - a) / np.maximum(a, b)
            s_mu = np.rint(s * 1e6)
            part = pa.table({
                "label": pa.array(lab),
                "smu": pa.array(s_mu.astype(np.int64)),
                "n": pa.array(np.ones(len(lab), np.int64)),
            }).group_by("label").aggregate([("smu", "sum"), ("n", "sum")])
            return pa.table({"label": part["label"],
                             "smu": part["smu_sum"], "n": part["n_sum"]})

        g = (
            ds.map_batches(sil_partial, batch_format="pyarrow",
                           zero_copy_batch=True)
            .groupby("label")
            .aggregate(Sum("smu", alias_name="smu"),
                       Sum("n", alias_name="n"))
        )
        from debezium_incubator_ray.functions.kernels import collect_table

        t = collect_table(g, empty=pa.table({
            "label": pa.array([], pa.int32()),
            "smu": pa.array([], pa.int64()),
            "n": pa.array([], pa.int64()),
        }))
        t = t.take(pc.sort_indices(t, sort_keys=[("label", "ascending")]))
        smu = [int(v) for v in t["smu"].to_pylist()]
        n = [int(v) for v in t["n"].to_pylist()]

        def mean6(s, nn):
            # half-AWAY-from-zero 6dp of (s / n) micro-units, exact in
            # int space, sign-aware (s can be negative)
            a = (2 * abs(s) + nn) // (2 * nn)
            return (a if s >= 0 else -a) / 1e6

        return pa.table({
            "label": pc.cast(t["label"], pa.int32()),
            "n": t["n"],
            "mean_s": pa.array(
                [mean6(s, nn) for s, nn in zip(smu, n)], pa.float64()
            ),
        })

    def graph_jaccard_neighbors(sf_dir):
        """Top-50 non-adjacent part pairs by neighborhood Jaccard on the
        top-2000 co-purchase subgraph — the set-overlap sibling of the
        Adamic-Adar row (integer common-neighbor counts, degree-broadcast
        union denominator; same bucketed wedge machinery)."""
        import pyarrow as pa
        import ray.data
        from debezium_incubator_ray.functions.joins import copurchase_pairs
        from debezium_incubator_ray.functions.graph import jaccard_topk

        li = ray.data.read_parquet(
            os.path.join(sf_dir, "lineitem.parquet"),
            columns=["l_orderkey", "l_partkey"],
        )
        top = copurchase_pairs(li, "l_orderkey", "l_partkey", k=2000)
        edges = ray.data.from_arrow(pa.table({
            "src": top["l_partkey_a"], "dst": top["l_partkey_b"],
        }))
        return jaccard_topk(edges, k=50, buckets=32)

    def text_flesch_hist(sf_dir):
        """Flesch reading-ease histogram over the corpus (10-point
        buckets) — the classic readability screen a curation pipeline
        thresholds on. Words = whitespace tokens; sentences = runs of
        [.!?] (floored at 1); syllables = vowel-group runs floored at
        one per word IN AGGREGATE (the per-word floor applied at doc
        granularity keeps both sides vectorized — no word unnest).
        The score expression is evaluated in the IDENTICAL double op
        order as the oracle, so the bucket floor cannot split."""
        import numpy as np
        import pyarrow as pa
        import pyarrow.compute as pc
        import ray.data
        from ray.data.aggregate import Sum
        from debezium_incubator_ray.functions.text import _flat_tokens

        ds = ray.data.read_parquet(
            os.path.join(sf_dir, "documents.parquet"), columns=["text"]
        )

        def partial(t: pa.Table) -> pa.Table:
            txt = pc.utf8_trim_whitespace(t["text"].combine_chunks())
            _, lens = _flat_tokens(t, "text")
            sents = pc.count_substring_regex(
                txt, "[.!?]+"
            ).to_numpy(zero_copy_only=False).astype(np.int64)
            vg = pc.count_substring_regex(
                pc.utf8_lower(txt), "[aeiouy]+"
            ).to_numpy(zero_copy_only=False).astype(np.int64)
            keep = lens > 0
            W = lens[keep].astype(np.float64)
            S = np.maximum(sents[keep], 1).astype(np.float64)
            SY = np.maximum(vg[keep], lens[keep]).astype(np.float64)
            flesch = 206.835 - 1.015 * (W / S) - 84.6 * (SY / W)
            bucket = np.floor(flesch / 10.0).astype(np.int64)
            part = pa.table({
                "bucket": pa.array(bucket),
                "n": pa.array(np.ones(len(bucket), np.int64)),
            }).group_by("bucket").aggregate([("n", "sum")])
            return pa.table({"bucket": part["bucket"],
                             "n": part["n_sum"]})

        g = (
            ds.map_batches(partial, batch_format="pyarrow",
                           zero_copy_batch=True)
            .groupby("bucket")
            .aggregate(Sum("n", alias_name="n_docs"))
        )
        from debezium_incubator_ray.functions.kernels import collect_table

        t = collect_table(g, empty=pa.table({
            "bucket": pa.array([], pa.int64()),
            "n_docs": pa.array([], pa.int64()),
        }))
        return t.take(pc.sort_indices(t, sort_keys=[
            ("bucket", "ascending")
        ]))

    def text_js_divergence(sf_dir):
        """Pairwise Jensen-Shannon divergence (log2) between the
        per-source unigram distributions — the drift gauge between
        corpus slices (the KL-symmetric cousin of the vocab-overlap
        Jaccard row). Per-(source, token) counts shuffle once bucketed
        by token hash; per-bucket dense pivots emit per-PAIR partial
        term sums (zeros included — a one-sided token contributes
        p/2), so only n_pairs x buckets tiny rows fold at the end. At
        web scale the vocabulary would be capped top-V first; the
        pair/bucket shape is unchanged."""
        import numpy as np
        import pyarrow as pa
        import pyarrow.compute as pc
        import ray
        import ray.data
        from ray.data.aggregate import Sum
        from debezium_incubator_ray.functions.text import _flat_tokens
        from debezium_incubator_ray.hashing import stable_hash

        BUCKETS = 32
        ds = ray.data.read_parquet(
            os.path.join(sf_dir, "documents.parquet"),
            columns=["source", "text"],
        )

        def explode(t: pa.Table) -> pa.Table:
            t = t.filter(pc.and_(pc.is_valid(t["source"]),
                                 pc.is_valid(t["text"])))
            flat, lens = _flat_tokens(t, "text")
            src = t["source"].combine_chunks().take(
                    pa.array(np.repeat(np.arange(t.num_rows), lens))
                )
            part = pa.table({
                "source": src, "token": flat,
                "c": pa.array(np.ones(len(flat), np.int64)),
            }).group_by(["source", "token"]).aggregate([("c", "sum")])
            return pa.table({
                "source": part["source"], "token": part["token"],
                "c": part["c_sum"],
            })

        counts = (
            ds.map_batches(explode, batch_format="pyarrow",
                           zero_copy_batch=True)
            .groupby(["source", "token"])
            .aggregate(Sum("c", alias_name="c"))
            .materialize()
        )

        totals = {
            r["source"]: r["c"]
            for r in counts.groupby("source")
            .aggregate(Sum("c", alias_name="c")).take_all()
        }
        srcs = sorted(totals)
        tot_ref = ray.put((srcs, np.array([totals[s] for s in srcs],
                                          np.float64)))

        def rebucket(t: pa.Table) -> pa.Table:
            tb = (stable_hash(t["token"]) % np.uint64(BUCKETS))                 .astype(np.int32)
            return t.append_column("_tb", pa.array(tb))

        def pair_terms(g: pa.Table) -> pa.Table:
            src_list, N = ray.get(tot_ref)
            sidx = {s: i for i, s in enumerate(src_list)}
            toks = g["token"].combine_chunks()
            utok, tinv = np.unique(
                toks.to_numpy(zero_copy_only=False), return_inverse=True
            )
            si = np.array(
                [sidx[s] for s in
                 g["source"].combine_chunks().to_pylist()], np.int64
            )
            C = np.zeros((len(utok), len(src_list)), np.float64)
            C[tinv, si] = g["c"].combine_chunks().to_numpy(
                zero_copy_only=False
            )
            P = C / N[None, :]  # per-source probability mass in-bucket
            k = len(src_list)
            ia, ib, term = [], [], []
            for i in range(k):
                for j in range(i + 1, k):
                    p, q = P[:, i], P[:, j]
                    m = 0.5 * (p + q)
                    with np.errstate(divide="ignore", invalid="ignore"):
                        tp = np.where(p > 0, p * np.log2(
                            np.where(p > 0, p, 1.0) / np.where(
                                m > 0, m, 1.0)), 0.0)
                        tq = np.where(q > 0, q * np.log2(
                            np.where(q > 0, q, 1.0) / np.where(
                                m > 0, m, 1.0)), 0.0)
                    ia.append(i)
                    ib.append(j)
                    term.append(0.5 * float((tp + tq).sum()))
            return pa.table({
                "source_a": pa.array([src_list[i] for i in ia]),
                "source_b": pa.array([src_list[j] for j in ib]),
                "t": pa.array(term, pa.float64()),
            })

        per_pair = (
            counts.map_batches(rebucket, batch_format="pyarrow",
                               zero_copy_batch=True)
            .groupby("_tb")
            .map_groups(pair_terms, batch_format="pyarrow")
            .groupby(["source_a", "source_b"])
            .aggregate(Sum("t", alias_name="jsd_raw"))
        )
        from debezium_incubator_ray.functions.kernels import collect_table

        t = collect_table(per_pair, empty=pa.table({
            "source_a": pa.array([], pa.string()),
            "source_b": pa.array([], pa.string()),
            "jsd_raw": pa.array([], pa.float64()),
        }))
        t = t.take(pc.sort_indices(t, sort_keys=[
            ("source_a", "ascending"), ("source_b", "ascending"),
        ]))
        return pa.table({
            "source_a": t["source_a"],
            "source_b": t["source_b"],
            "jsd": pc.round(t["jsd_raw"], 6),
        })

    def stats_hellinger(sf_dir):
        """Hellinger distance between the purchase and view value
        distributions on a unit-width grid — the bounded [0,1]
        distribution-shift metric (companion to the PSI drift row).
        Buckets follow the float-grid rule (round(6) BEFORE floor on
        both sides); counts fold as exact ints and only the final
        sqrt(1 - BC) is float."""
        import numpy as np
        import pyarrow as pa
        import pyarrow.compute as pc
        import ray.data
        from ray.data.aggregate import Sum

        ds = ray.data.read_parquet(
            os.path.join(sf_dir, "events.parquet"),
            columns=["event_type", "value"],
        )

        def partial(t: pa.Table) -> pa.Table:
            t = t.filter(pc.and_(
                pc.is_in(t["event_type"],
                         value_set=pa.array(["purchase", "view"])),
                pc.is_valid(t["value"]),
            ))
            v = t["value"].combine_chunks().to_numpy(
                zero_copy_only=False
            )
            ok = ~np.isnan(v)
            v = v[ok]
            g = t["event_type"].combine_chunks().to_numpy(
                zero_copy_only=False
            )[ok]
            bucket = np.floor(np.round(v, 6)).astype(np.int64)
            part = pa.table({
                "g": pa.array(g), "bucket": pa.array(bucket),
                "n": pa.array(np.ones(len(v), np.int64)),
            }).group_by(["g", "bucket"]).aggregate([("n", "sum")])
            return pa.table({"g": part["g"], "bucket": part["bucket"],
                             "n": part["n_sum"]})

        rows = (
            ds.map_batches(partial, batch_format="pyarrow",
                           zero_copy_batch=True)
            .groupby(["g", "bucket"])
            .aggregate(Sum("n", alias_name="n"))
            .take_all()
        )  # distinct (group, unit bucket) — grid-bounded
        from collections import defaultdict

        cp, cv = defaultdict(int), defaultdict(int)
        for r in rows:
            (cp if r["g"] == "purchase" else cv)[r["bucket"]] = r["n"]
        np_, nv = sum(cp.values()), sum(cv.values())
        bc = 0.0
        for b in sorted(set(cp) | set(cv)):
            bc += float(np.sqrt((cp[b] / np_) * (cv[b] / nv)))
        h = float(np.sqrt(max(1.0 - bc, 0.0)))
        return pa.table({
            "n_purchase": pa.array([np_], pa.int64()),
            "n_view": pa.array([nv], pa.int64()),
            "bhattacharyya": pa.array([round(bc, 6)], pa.float64()),
            "hellinger": pa.array([round(h, 6)], pa.float64()),
        })

    def events_dow_hour_heatmap(sf_dir):
        """The dow x hour activity heatmap (exact counts) — the
        profiling grid every ops dashboard starts from. Integer
        epoch-day arithmetic (isodow = ((day + 3) mod 7) + 1) matches
        the oracle's isodow()/hour(); per-batch 7 x 24 partials fold
        in one tiny groupby."""
        import numpy as np
        import pyarrow as pa
        import pyarrow.compute as pc
        import ray.data
        from ray.data.aggregate import Sum

        ds = ray.data.read_parquet(
            os.path.join(sf_dir, "events.parquet"), columns=["ts"]
        )
        US_H = 3_600_000_000
        US_D = 24 * US_H

        def partial(t: pa.Table) -> pa.Table:
            ts = t["ts"].combine_chunks()
            ts = ts.filter(pc.is_valid(ts)).cast(pa.int64()).to_numpy(
                zero_copy_only=False
            )
            dow = ((ts // US_D + 3) % 7 + 1).astype(np.int64)
            hour = ((ts // US_H) % 24).astype(np.int64)
            part = pa.table({
                "dow": pa.array(dow), "hour": pa.array(hour),
                "n": pa.array(np.ones(len(ts), np.int64)),
            }).group_by(["dow", "hour"]).aggregate([("n", "sum")])
            return pa.table({"dow": part["dow"], "hour": part["hour"],
                             "n": part["n_sum"]})

        g = (
            ds.map_batches(partial, batch_format="pyarrow",
                           zero_copy_batch=True)
            .groupby(["dow", "hour"])
            .aggregate(Sum("n", alias_name="n"))
        )
        from debezium_incubator_ray.functions.kernels import collect_table

        t = collect_table(g, empty=pa.table({
            "dow": pa.array([], pa.int64()),
            "hour": pa.array([], pa.int64()),
            "n": pa.array([], pa.int64()),
        }))
        return t.take(pc.sort_indices(t, sort_keys=[
            ("dow", "ascending"), ("hour", "ascending"),
        ]))

    def dedup_semantic(sf_dir):
        """SemDeDup-style semantic pruning (Abbas et al. 2023 shape):
        cluster the corpus with spherical k-means (k=8, one recenter,
        deterministic init — the embedding_kmeans trajectory), then
        inside each cluster drop every vector that has cosine >= 0.35
        (rounded 6dp) to ANY lower-id member. Assignment reuses the
        ONE kmeans_assign kernel (ann.py) so the oracle's trajectory
        cannot drift. The in-cluster pairwise pass is chunked so task
        memory stays O(chunk x cluster), and the quadratic COMPUTE is
        bounded by cluster size — at corpus scale k must grow with N
        (SemDeDup's own recipe, k ~ N / target cluster size); the
        fixed k=8 here is the oracle-reproducible small-scale setting.
        Returns the survivors' (vec_id, cluster)."""
        import numpy as np
        import pyarrow as pa
        import pyarrow.compute as pc
        import pyarrow.parquet as pq
        import ray
        import ray.data
        from debezium_incubator_ray.functions.ann import (
            spherical_kmeans, _batch_matrix, _normalize, kmeans_assign,
        )

        TAU = 0.35
        et = pq.read_table(os.path.join(sf_dir, "embeddings.parquet"),
                           filters=[("vec_id", "<", 8)])
        ct = et.sort_by([("vec_id", "ascending")])
        ds = ray.data.read_parquet(
            os.path.join(sf_dir, "embeddings.parquet"),
            columns=["vec_id", "embedding"],
        )
        C, _assign = spherical_kmeans(ds, _batch_matrix(ct), iters=1)
        cref = ray.put(C)

        def tag(t: pa.Table) -> pa.Table:
            M = _batch_matrix(t, "embedding")
            cid = kmeans_assign(M, ray.get(cref)).astype(np.int64)
            return pa.table({
                "vec_id": t["vec_id"], "embedding": t["embedding"],
                "cluster": pa.array(cid),
            })

        def prune(g: pa.Table) -> pa.Table:
            g = g.sort_by([("vec_id", "ascending")])
            M = _normalize(_batch_matrix(g, "embedding"))
            n = M.shape[0]
            # chunked lower-triangle scan: memory O(chunk x n), not n^2
            CH = 1024
            keep = np.ones(n, bool)
            for lo in range(0, n, CH):
                hi = min(lo + CH, n)
                S = np.round(M[lo:hi] @ M.T, 6)  # (chunk, n)
                cols = np.arange(n)[None, :]
                rows = np.arange(lo, hi)[:, None]
                close = (S >= TAU) & (cols < rows)
                keep[lo:hi] = ~close.any(axis=1)
            return pa.table({
                "vec_id": g["vec_id"].filter(pa.array(keep)),
                "cluster": g["cluster"].filter(pa.array(keep)),
            })

        out = (
            ds.map_batches(tag, batch_format="pyarrow",
                           zero_copy_batch=True)
            .groupby("cluster")
            .map_groups(prune, batch_format="pyarrow")
        )
        from debezium_incubator_ray.functions.kernels import collect_table

        t = collect_table(out, empty=pa.table({
            "vec_id": pa.array([], pa.int64()),
            "cluster": pa.array([], pa.int64()),
        }))
        return t.take(pc.sort_indices(t, sort_keys=[
            ("vec_id", "ascending")
        ]))

    def docs_dsir_weights(sf_dir):
        """DSIR-style importance weights (Xie et al. 2023 shape): hashed
        unigram bucket counts build a target (lang='en') and a raw
        distribution (Laplace +1 over B=64 buckets); each doc scores
        sum of count[b] * log-likelihood-ratio[b] and the top-50 come
        back. Two streaming passes — a B-row global fold (broadcast
        once) and a per-batch score+topk partial; only k x blocks rows
        reach the driver."""
        import numpy as np
        import pyarrow as pa
        import pyarrow.compute as pc
        import ray
        import ray.data
        from ray.data.aggregate import Sum
        from debezium_incubator_ray.functions.tokens import (
            flat_tokens, md5_u64,
        )

        B = 64
        ds = ray.data.read_parquet(
            os.path.join(sf_dir, "documents.parquet"),
            columns=["doc_id", "lang", "text"],
        )

        def bucket_partial(t: pa.Table) -> pa.Table:
            t = t.filter(pc.is_valid(t["text"]))
            flat, lens = flat_tokens(t["text"])
            b = (md5_u64(flat) % np.uint64(B)).astype(np.int64)
            lang = t["lang"].combine_chunks().to_numpy(
                zero_copy_only=False
            )
            is_en = np.repeat(lang == "en", lens)
            cr = np.bincount(b, minlength=B).astype(np.int64)
            ct_ = np.bincount(b[is_en], minlength=B).astype(np.int64)
            return pa.table({
                "bucket": pa.array(np.arange(B, dtype=np.int64)),
                "ct": pa.array(ct_), "cr": pa.array(cr),
            })

        rows = (
            ds.map_batches(bucket_partial, batch_format="pyarrow",
                           zero_copy_batch=True)
            .groupby("bucket")
            .aggregate(Sum("ct", alias_name="ct"),
                       Sum("cr", alias_name="cr"))
            .take_all()
        )  # B rows
        ct_ = np.zeros(B, np.int64)
        cr = np.zeros(B, np.int64)
        for r in rows:
            ct_[r["bucket"]] = r["ct"]
            cr[r["bucket"]] = r["cr"]
        nt, nr = float(ct_.sum()), float(cr.sum())
        llr = np.log((ct_ + 1) / (nt + float(B))) - np.log(
            (cr + 1) / (nr + float(B))
        )
        llr_ref = ray.put(llr)

        from debezium_incubator_ray.functions.kernels import (
            merge_local_topk, table_topk,
        )

        def score_partial(t: pa.Table) -> pa.Table:
            lv = ray.get(llr_ref)
            t = t.filter(pc.is_valid(t["text"]))
            flat, lens = flat_tokens(t["text"])
            b = (md5_u64(flat) % np.uint64(B)).astype(np.int64)
            doc_idx = np.repeat(np.arange(t.num_rows), lens)
            score = np.zeros(t.num_rows, np.float64)
            np.add.at(score, doc_idx, lv[b])
            keep = lens > 0
            out = pa.table({
                "doc_id": t["doc_id"].combine_chunks().filter(
                    pa.array(keep)
                ),
                "lang": t["lang"].combine_chunks().filter(
                    pa.array(keep)
                ),
                "dsir_w": pc.round(
                    pa.array(score[keep]), 6,
                    round_mode="half_towards_infinity",
                ),
            })
            return table_topk(out, "dsir_w", ["doc_id"], 50)

        cand = ds.map_batches(score_partial, batch_format="pyarrow",
                              zero_copy_batch=True)
        empty = pa.table({
            "doc_id": pa.array([], pa.int64()),
            "lang": pa.array([], pa.string()),
            "dsir_w": pa.array([], pa.float64()),
        })
        top = merge_local_topk(cand, "dsir_w", ["doc_id"], 50, empty)
        order = pc.sort_indices(
            top.append_column("_neg", pc.negate(top["dsir_w"])),
            sort_keys=[("_neg", "ascending"), ("doc_id", "ascending")],
        )
        return top.select(["doc_id", "lang", "dsir_w"]).take(order)

    def graph_modularity(sf_dir):
        """Newman modularity of the 3-round label-propagation communities
        on the top-2000 co-purchase subgraph — the partition-quality
        gauge for the graph_label_prop row. Q folds from EXACT integer
        pieces (intra-edge counts and degree sums per community) into
        the single-division form sum(4*m*m_c - D_c^2) / (4*m^2), so
        both sides produce the identical double. Labels broadcast once
        (the cut graph is metadata-sized by construction); per-batch
        edge partials stay vectorized."""
        import numpy as np
        import pyarrow as pa
        import ray
        import ray.data
        from debezium_incubator_ray.functions.joins import copurchase_pairs
        from debezium_incubator_ray.functions.graph import (
            label_propagation,
        )

        li = ray.data.read_parquet(
            os.path.join(sf_dir, "lineitem.parquet"),
            columns=["l_orderkey", "l_partkey"],
        )
        top = copurchase_pairs(li, "l_orderkey", "l_partkey", k=2000)
        edges = ray.data.from_arrow(pa.table({
            "src": top["l_partkey_a"], "dst": top["l_partkey_b"],
        }))
        labs = label_propagation(edges, rounds=3, buckets=32)
        nodes = labs["node"].to_numpy(zero_copy_only=False)
        labels = labs["label"].to_numpy(zero_copy_only=False)
        order = np.argsort(nodes)
        nodes, labels = nodes[order], labels[order]

        a = top["l_partkey_a"].to_numpy(zero_copy_only=False)
        b = top["l_partkey_b"].to_numpy(zero_copy_only=False)
        la = labels[np.searchsorted(nodes, a)]
        lb = labels[np.searchsorted(nodes, b)]
        m = len(a)
        ulab = np.unique(labels)
        # intra-community edge counts
        intra = la[la == lb]
        mc = np.zeros(len(ulab), np.int64)
        np.add.at(mc, np.searchsorted(ulab, intra), 1)
        # degree sums per community (each edge endpoint adds 1)
        dc = np.zeros(len(ulab), np.int64)
        np.add.at(dc, np.searchsorted(ulab, la), 1)
        np.add.at(dc, np.searchsorted(ulab, lb), 1)
        num = int((4 * m * mc.astype(object)).sum()
                  - (dc.astype(object) ** 2).sum())
        q = num / float(4 * m * m)
        return pa.table({
            "n_edges": pa.array([m], pa.int64()),
            "n_communities": pa.array([len(ulab)], pa.int64()),
            "modularity": pa.array([round(q, 6)], pa.float64()),
        })

    def graph_degree_hist(sf_dir):
        """Degree histogram of the top-2000 co-purchase subgraph —
        (degree, n_nodes) exact counts, the first thing anyone plots
        about a graph. The distributed work is the co-purchase cut
        itself (copurchase_pairs); the returned top-k edge set is
        metadata-sized by construction, so the two unique() folds run
        on the driver."""
        import numpy as np
        import pyarrow as pa
        import ray.data
        from debezium_incubator_ray.functions.joins import copurchase_pairs

        li = ray.data.read_parquet(
            os.path.join(sf_dir, "lineitem.parquet"),
            columns=["l_orderkey", "l_partkey"],
        )
        top = copurchase_pairs(li, "l_orderkey", "l_partkey", k=2000)
        both = np.concatenate([
            top["l_partkey_a"].to_numpy(zero_copy_only=False),
            top["l_partkey_b"].to_numpy(zero_copy_only=False),
        ])
        un, cnt = np.unique(both, return_counts=True)
        deg, nn = np.unique(cnt, return_counts=True)
        return pa.table({
            "degree": pa.array(deg.astype(np.int64)),
            "n_nodes": pa.array(nn.astype(np.int64)),
        })

    def join_q10_returns(sf_dir):
        """The TPC-H Q10 shape: top-20 customers by revenue of RETURNED
        items (returnflag 'R') for orders placed in the 2000-Q1 window,
        with name and nation attached. The order window reduces first
        and broadcasts (orderkey -> custkey); lineitem folds returned
        revenue per customer in exact cents x bp; the rounded-cents
        top-k merges k x blocks rows; the tiny customer/nation dims
        attach on the driver."""
        import numpy as np
        import pyarrow as pa
        import pyarrow.compute as pc
        import ray
        import ray.data
        from ray.data.aggregate import Sum
        from debezium_incubator_ray.functions.kernels import (
            collect_table, merge_local_topk, table_topk,
        )

        LO = np.datetime64("2000-01-01T00:00:00", "us").astype(np.int64)
        HI = np.datetime64("2000-04-01T00:00:00", "us").astype(np.int64)

        orders = ray.data.read_parquet(
            os.path.join(sf_dir, "orders.parquet"),
            columns=["o_orderkey", "o_custkey", "o_orderdate"],
        )

        def ord_part(t: pa.Table) -> pa.Table:
            od = t["o_orderdate"].combine_chunks().cast(
                pa.int64()
            ).to_numpy(zero_copy_only=False)
            return t.filter(pa.array((od >= LO) & (od < HI))).select(
                ["o_orderkey", "o_custkey"]
            )

        ot = collect_table(orders.map_batches(
            ord_part, batch_format="pyarrow", zero_copy_batch=True
        ), empty=pa.table({"o_orderkey": pa.array([], pa.int64()),
                           "o_custkey": pa.array([], pa.int64())}))
        okeys = ot["o_orderkey"].to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        oord = np.argsort(okeys)
        okeys = okeys[oord]
        ocust = ot["o_custkey"].to_numpy(zero_copy_only=False) \
            .astype(np.int64)[oord]
        oref = ray.put((okeys, ocust))

        li = ray.data.read_parquet(
            os.path.join(sf_dir, "lineitem.parquet"),
            columns=["l_orderkey", "l_extendedprice", "l_discount",
                     "l_returnflag"],
        )

        def li_part(t: pa.Table) -> pa.Table:
            ok, oc = ray.get(oref)
            t = t.filter(pc.equal(t["l_returnflag"], "R"))
            if t.num_rows == 0 or len(ok) == 0:
                return pa.table({
                    "c_custkey": pa.array([], pa.int64()),
                    "rev": pa.array([], pa.int64()),
                })
            lo = t["l_orderkey"].combine_chunks().to_numpy(
                zero_copy_only=False
            )
            pos = np.searchsorted(ok, lo)
            pos[pos == len(ok)] = 0
            keep = ok[pos] == lo
            t = t.filter(pa.array(keep))
            cust = oc[pos[keep]]
            price_c = pc.cast(
                pc.round(pc.multiply(t["l_extendedprice"], 100.0)),
                pa.int64(),
            ).to_numpy(zero_copy_only=False)
            disc_bp = pc.cast(
                pc.round(pc.multiply(t["l_discount"], 100.0)), pa.int64()
            ).to_numpy(zero_copy_only=False)
            part = pa.table({
                "c_custkey": pa.array(cust),
                "rev": pa.array(price_c * (100 - disc_bp)),
            }).group_by("c_custkey").aggregate([("rev", "sum")])
            return pa.table({"c_custkey": part["c_custkey"],
                             "rev": part["rev_sum"]})

        per_cust = (
            li.map_batches(li_part, batch_format="pyarrow",
                           zero_copy_batch=True)
            .groupby("c_custkey")
            .aggregate(Sum("rev", alias_name="rev"))
        )

        def topk_part(t: pa.Table) -> pa.Table:
            rev = t["rev"].combine_chunks().to_numpy(
                zero_copy_only=False
            )
            out = pa.table({
                "c_custkey": t["c_custkey"],
                "revenue": pa.array(((rev + 50) // 100) / 100.0),
            })
            return table_topk(out, "revenue", ["c_custkey"], 20)

        cand = per_cust.map_batches(topk_part, batch_format="pyarrow",
                                    zero_copy_batch=True)
        empty = pa.table({"c_custkey": pa.array([], pa.int64()),
                          "revenue": pa.array([], pa.float64())})
        topt = merge_local_topk(cand, "revenue", ["c_custkey"], 20,
                                empty)
        order = pc.sort_indices(
            topt.append_column("_neg", pc.negate(topt["revenue"])),
            sort_keys=[("_neg", "ascending"), ("c_custkey", "ascending")],
        )
        topt = topt.select(["c_custkey", "revenue"]).take(order)

        import pyarrow.parquet as pq

        ctab = pq.read_table(
            os.path.join(sf_dir, "customer.parquet"),
            columns=["c_custkey", "c_name", "c_nationkey"],
        )
        ntab = pq.read_table(os.path.join(sf_dir, "nation.parquet"))
        ck = ctab["c_custkey"].to_numpy(zero_copy_only=False)
        cord = np.argsort(ck)
        pos = cord[np.searchsorted(ck[cord], topt["c_custkey"]
                                   .to_numpy(zero_copy_only=False))]
        names = ctab["c_name"].take(pa.array(pos))
        natk = ctab["c_nationkey"].to_numpy(
            zero_copy_only=False
        )[pos].astype(np.int64)
        nk = ntab["n_nationkey"].to_numpy(
            zero_copy_only=False
        ).astype(np.int64)
        nord = np.argsort(nk)
        npos = nord[np.searchsorted(nk[nord], natk)]
        nnames = ntab["n_name"].take(pa.array(npos))
        return pa.table({
            "c_custkey": topt["c_custkey"],
            "c_name": names,
            "n_name": nnames,
            "revenue": topt["revenue"],
        })

    def join_q14_promo(sf_dir):
        """The TPC-H Q14 promo-revenue share: 100 x promo revenue /
        total revenue over one shipdate month, with the part type
        looked up from a broadcast (partkey -> is_promo) bitmap.
        Revenue folds in exact cents x bp; the final percentage is a
        RATIONAL, so it rounds half-away in integer space on both
        sides instead of trusting float round."""
        import numpy as np
        import pyarrow as pa
        import pyarrow.compute as pc
        import pyarrow.parquet as pq
        import ray
        import ray.data

        LO = np.datetime64("2000-09-01T00:00:00", "us").astype(np.int64)
        HI = np.datetime64("2000-10-01T00:00:00", "us").astype(np.int64)

        pt = pq.read_table(os.path.join(sf_dir, "part.parquet"),
                           columns=["p_partkey", "p_type"])
        pk = pt["p_partkey"].to_numpy(zero_copy_only=False)
        order = np.argsort(pk)
        pk = pk[order]
        promo = pc.equal(pt["p_type"], "PROMO").to_numpy(
            zero_copy_only=False
        )[order]
        pref = ray.put((pk, promo))

        li = ray.data.read_parquet(
            os.path.join(sf_dir, "lineitem.parquet"),
            columns=["l_partkey", "l_extendedprice", "l_discount",
                     "l_shipdate"],
        )

        def partial(t: pa.Table) -> pa.Table:
            keys, isp = ray.get(pref)
            ship = t["l_shipdate"].combine_chunks().cast(
                pa.int64()
            ).to_numpy(zero_copy_only=False)
            t = t.filter(pa.array((ship >= LO) & (ship < HI)))
            if t.num_rows == 0:
                return pa.table({"sp": pa.array([], pa.int64()),
                                 "st": pa.array([], pa.int64())})
            price_c = pc.cast(
                pc.round(pc.multiply(t["l_extendedprice"], 100.0)),
                pa.int64(),
            ).to_numpy(zero_copy_only=False)
            disc_bp = pc.cast(
                pc.round(pc.multiply(t["l_discount"], 100.0)), pa.int64()
            ).to_numpy(zero_copy_only=False)
            rev = price_c * (100 - disc_bp)
            lp = t["l_partkey"].combine_chunks().to_numpy(
                zero_copy_only=False
            )
            pos = np.searchsorted(keys, lp)
            pos[pos == len(keys)] = 0
            pm = (keys[pos] == lp) & isp[pos]
            return pa.table({
                "sp": pa.array([int(rev[pm].sum())], pa.int64()),
                "st": pa.array([int(rev.sum())], pa.int64()),
            })

        rows = li.map_batches(partial, batch_format="pyarrow",
                              zero_copy_batch=True).take_all()
        sp = sum(r["sp"] for r in rows)
        st = sum(r["st"] for r in rows)
        # promo_share = 100 * sp / st, rounded half-away to 6dp EXACTLY
        share = ((200_000_000 * sp + st) // (2 * st)) / 1e6 if st else 0.0
        return pa.table({
            "promo_revenue": pa.array(
                [((sp + 50) // 100) / 100.0], pa.float64()
            ),
            "total_revenue": pa.array(
                [((st + 50) // 100) / 100.0], pa.float64()
            ),
            "promo_share_pct": pa.array([share], pa.float64()),
        })

    def text_unigram_entropy(sf_dir):
        """Per-source unigram Shannon entropy (bits) + perplexity +
        vocab size — the lexical-diversity profile a corpus card
        reports. Per-(source, token) counts shuffle once; the entropy
        folds from exact counts as H = log2(N) - sum(c*log2(c))/N so
        the only float work is the tiny per-source finish."""
        import numpy as np
        import pyarrow as pa
        import pyarrow.compute as pc
        import ray.data
        from ray.data.aggregate import Sum
        from debezium_incubator_ray.functions.text import _flat_tokens

        ds = ray.data.read_parquet(
            os.path.join(sf_dir, "documents.parquet"),
            columns=["source", "text"],
        )

        def explode(t: pa.Table) -> pa.Table:
            t = t.filter(pc.and_(pc.is_valid(t["source"]),
                                 pc.is_valid(t["text"])))
            flat, lens = _flat_tokens(t, "text")
            srcs = t["source"].combine_chunks().take(
                pa.array(np.repeat(np.arange(t.num_rows), lens))
            )
            part = pa.table({
                "source": srcs, "token": flat,
                "c": pa.array(np.ones(len(flat), np.int64)),
            }).group_by(["source", "token"]).aggregate([("c", "sum")])
            return pa.table({"source": part["source"],
                             "token": part["token"],
                             "c": part["c_sum"]})

        def fold(t: pa.Table) -> pa.Table:
            # per (source) partial: n tokens, vocab, sum c*log2(c) —
            # runs AFTER the (source, token) fold so c is global-exact
            c = t["c"].combine_chunks().to_numpy(zero_copy_only=False) \
                .astype(np.float64)
            part = pa.table({
                "source": t["source"],
                "n": pa.array(c.astype(np.int64)),
                "v": pa.array(np.ones(len(c), np.int64)),
                "clogc": pa.array(c * np.log2(c)),
            }).group_by("source").aggregate(
                [("n", "sum"), ("v", "sum"), ("clogc", "sum")]
            )
            return pa.table({
                "source": part["source"], "n": part["n_sum"],
                "v": part["v_sum"], "clogc": part["clogc_sum"],
            })

        g = (
            ds.map_batches(explode, batch_format="pyarrow",
                           zero_copy_batch=True)
            .groupby(["source", "token"])
            .aggregate(Sum("c", alias_name="c"))
            .map_batches(fold, batch_format="pyarrow",
                         zero_copy_batch=True)
            .groupby("source")
            .aggregate(Sum("n", alias_name="n"),
                       Sum("v", alias_name="v"),
                       Sum("clogc", alias_name="clogc"))
        )
        from debezium_incubator_ray.functions.kernels import collect_table

        t = collect_table(g, empty=pa.table({
            "source": pa.array([], pa.string()),
            "n": pa.array([], pa.int64()),
            "v": pa.array([], pa.int64()),
            "clogc": pa.array([], pa.float64()),
        }))
        t = t.take(pc.sort_indices(t, sort_keys=[
            ("source", "ascending")
        ]))
        n = t["n"].to_numpy(zero_copy_only=False).astype(np.float64)
        clogc = t["clogc"].to_numpy(zero_copy_only=False)
        H = np.log2(n) - clogc / n
        return pa.table({
            "source": t["source"],
            "n_tokens": t["n"],
            "vocab": t["v"],
            "entropy_bits": pa.array(np.round(H, 6)),
            "perplexity": pa.array(np.round(np.power(2.0, H), 6)),
        })

    def multimodal_pixel_stats(sf_dir):
        """REAL media decode round-trip: deterministic fully-decodable
        payloads (PNG with zlib IDAT, padded bottom-up BMP24, PCM16
        WAV) are synthesized per doc_id, decoded through the baseline
        codecs (functions/multimodal.py — actual zlib inflate +
        unfilter, not a header parse), and reduced to exact integer
        pixel/sample stats. The oracle restates the closed-form
        pixel/sample formulas with NO decoder — a wrong PNG filter,
        BMP stride/padding or WAV endianness shifts the sums. Codec
        work is per-payload by nature; the actor-pool map_batches with
        small batches is the realistic shape."""
        import pyarrow as pa
        import ray.data
        from debezium_incubator_ray.functions.multimodal import (
            PixelStatsDecoder, synth_decodable_payloads,
        )

        ds = ray.data.read_parquet(
            os.path.join(sf_dir, "documents.parquet"),
            columns=["doc_id"],
        )

        def to_payload(t: pa.Table) -> pa.Table:
            ids = t["doc_id"].combine_chunks().to_numpy(
                zero_copy_only=False
            )
            return pa.table({
                "doc_id": t["doc_id"],
                "payload": synth_decodable_payloads(ids),
            })

        return (
            ds.map_batches(to_payload, batch_format="pyarrow",
                           zero_copy_batch=True)
            .map_batches(PixelStatsDecoder, batch_format="pyarrow",
                         zero_copy_batch=True, batch_size=128,
                         concurrency=(1, 4))
        )

    def multimodal_webp_meta(sf_dir):
        """WebP header metadata extraction (all three container
        variants — lossy 'VP8 ' frame header, lossless 'VP8L' packed
        bit fields, extended 'VP8X' canvas) through the vectorized
        byte-level parser; pixel decode stays honestly library-bound.
        The oracle restates the generator's dimension/alpha formulas
        with no parser."""
        import pyarrow as pa
        import ray.data
        from debezium_incubator_ray.functions.multimodal import (
            MediaHeaderParser, synth_webp_headers,
        )

        ds = ray.data.read_parquet(
            os.path.join(sf_dir, "documents.parquet"),
            columns=["doc_id"],
        )

        def to_payload(t: pa.Table) -> pa.Table:
            ids = t["doc_id"].combine_chunks().to_numpy(
                zero_copy_only=False
            )
            return pa.table({
                "doc_id": t["doc_id"],
                "payload": synth_webp_headers(ids),
            })

        return (
            ds.map_batches(to_payload, batch_format="pyarrow",
                           zero_copy_batch=True)
            .map_batches(MediaHeaderParser, batch_format="pyarrow",
                         zero_copy_batch=True, batch_size=256,
                         concurrency=(1, 4))
            .select_columns(["doc_id", "kind", "width", "height",
                             "channels", "bit_depth"])
        )

    def multimodal_jpeg_stats(sf_dir):
        """REAL baseline-JPEG decode round-trip: deterministic grayscale
        baseline-sequential JPEGs (DC-only blocks, flat q0=16 quant)
        synthesized per doc_id, decoded through the pure-numpy JPEG
        decoder (functions/multimodal.py decode_jpeg_baseline — real
        marker parse, canonical Huffman entropy decode, dequantize,
        IDCT, level shift), reduced to exact integer pixel stats. The
        oracle restates the closed form with NO decoder: pixel =
        clip(128 + 2·dc) where dc(by,bx) = ((5·by + 3·bx + s) % 201) -
        100 — a wrong Huffman table, zigzag order, dequant or IDCT
        scaling shifts the sums, and the ±100 dc range drives pixels
        through BOTH clip rails."""
        import pyarrow as pa
        import ray.data
        from debezium_incubator_ray.functions.multimodal import (
            PixelStatsDecoder, synth_jpeg_payloads,
        )

        ds = ray.data.read_parquet(
            os.path.join(sf_dir, "documents.parquet"),
            columns=["doc_id"],
        )

        def to_payload(t: pa.Table) -> pa.Table:
            ids = t["doc_id"].combine_chunks().to_numpy(
                zero_copy_only=False
            )
            return pa.table({
                "doc_id": t["doc_id"],
                "payload": synth_jpeg_payloads(ids),
            })

        return (
            ds.map_batches(to_payload, batch_format="pyarrow",
                           zero_copy_batch=True)
            .map_batches(PixelStatsDecoder, batch_format="pyarrow",
                         zero_copy_batch=True, batch_size=128,
                         concurrency=(1, 4))
        )

    def dedup_phash_groups(sf_dir):
        """Perceptual-hash near-dup groups over REALLY-DECODED images:
        each image doc decodes through the baseline codecs, a 16-bit
        aHash folds from EXACT integers (gray value at the 4x4
        nearest-neighbor sample grid, bit = gray * n_pixels > total
        gray sum — integer cross-multiplication, no rational mean),
        and hash buckets with >1 member come back as dup groups. The
        oracle recomputes the hash from the closed-form pixel formulas
        with no decoder — so a decode defect anywhere flips bits.
        Decode+hash is the actor-pool stage; only (hash, count)
        partials shuffle."""
        import numpy as np
        import pyarrow as pa
        import pyarrow.compute as pc
        import ray.data
        from ray.data.aggregate import Count, Min
        from debezium_incubator_ray.functions.multimodal import (
            decode_payload, synth_decodable_payloads,
        )

        ds = ray.data.read_parquet(
            os.path.join(sf_dir, "documents.parquet"),
            columns=["doc_id"],
        )

        class HashStage:
            def __call__(self, t: pa.Table) -> pa.Table:
                ids = t["doc_id"].combine_chunks().to_numpy(
                    zero_copy_only=False
                )
                img_ids = ids[ids % 4 != 2]  # images only (wav excluded)
                payloads = synth_decodable_payloads(img_ids)
                hashes = np.empty(len(img_ids), np.int64)
                for i in range(len(img_ids)):
                    px = decode_payload(payloads[i].as_py()).astype(
                        np.int64
                    )
                    if px.ndim == 2:  # grayscale jpeg: 3x to the RGB
                        gray = px * 3  # 0..765 gray scale
                        h, w = px.shape
                    else:
                        h, w, _ = px.shape
                        gray = px.sum(axis=2)  # integer 3-channel sum
                    S, N = int(gray.sum()), h * w
                    rs = (np.arange(4) * h) // 4
                    cs = (np.arange(4) * w) // 4
                    sample = gray[np.ix_(rs, cs)].ravel()
                    bits = (sample * N > S).astype(np.int64)
                    hashes[i] = int((bits << np.arange(16)).sum())
                return pa.table({
                    "ahash": pa.array(hashes),
                    "doc_id": pa.array(img_ids),
                })

        g = (
            ds.map_batches(HashStage, batch_format="pyarrow",
                           zero_copy_batch=True, batch_size=256,
                           concurrency=(1, 4))
            .groupby("ahash")
            .aggregate(Count(alias_name="n_docs"),
                       Min("doc_id", alias_name="min_doc_id"))
        )
        from debezium_incubator_ray.functions.kernels import collect_table

        t = collect_table(g, empty=pa.table({
            "ahash": pa.array([], pa.int64()),
            "n_docs": pa.array([], pa.int64()),
            "min_doc_id": pa.array([], pa.int64()),
        }))
        t = t.filter(pc.greater(t["n_docs"], 1))
        return t.take(pc.sort_indices(t, sort_keys=[
            ("ahash", "ascending")
        ]))

    def text_fertility_by_lang(sf_dir):
        """Tokenizer fertility per language: chars-per-token (and
        tokens-per-doc) from exact integer sums — the corpus-card
        metric that flags scripts a whitespace tokenizer undersegments
        (zh vs en here). Ratios of exact ints round half-away in
        integer space on both sides."""
        import numpy as np
        import pyarrow as pa
        import pyarrow.compute as pc
        import ray.data
        from ray.data.aggregate import Sum
        from debezium_incubator_ray.functions.text import _flat_tokens

        ds = ray.data.read_parquet(
            os.path.join(sf_dir, "documents.parquet"),
            columns=["lang", "text"],
        )

        def partial(t: pa.Table) -> pa.Table:
            t = t.filter(pc.and_(pc.is_valid(t["lang"]),
                                 pc.is_valid(t["text"])))
            flat, lens = _flat_tokens(t, "text")
            # chars = total length of the TOKENS (whitespace excluded),
            # counted in UNICODE code points to match SQL length()
            tok_chars = pc.utf8_length(flat).to_numpy(
                zero_copy_only=False
            ).astype(np.int64)
            doc_idx = np.repeat(np.arange(t.num_rows), lens)
            chars = np.zeros(t.num_rows, np.int64)
            np.add.at(chars, doc_idx, tok_chars)
            keep = lens > 0  # docs with no (ASCII-whitespace) tokens
            # are outside the oracle's universe — the oracle counts
            # docs/tokens from its non-empty token stream, so both
            # sides drop them. (Edge U+3000-style Unicode whitespace
            # differs by tokenizer contract — ASCII corpus here.)
            part = pa.table({
                "lang": t["lang"].combine_chunks().filter(
                    pa.array(keep)
                ),
                "n_docs": pa.array(np.ones(int(keep.sum()), np.int64)),
                "n_tokens": pa.array(lens[keep]),
                "n_chars": pa.array(chars[keep]),
            }).group_by("lang").aggregate(
                [("n_docs", "sum"), ("n_tokens", "sum"),
                 ("n_chars", "sum")]
            )
            return pa.table({
                "lang": part["lang"], "n_docs": part["n_docs_sum"],
                "n_tokens": part["n_tokens_sum"],
                "n_chars": part["n_chars_sum"],
            })

        g = (
            ds.map_batches(partial, batch_format="pyarrow",
                           zero_copy_batch=True)
            .groupby("lang")
            .aggregate(Sum("n_docs", alias_name="n_docs"),
                       Sum("n_tokens", alias_name="n_tokens"),
                       Sum("n_chars", alias_name="n_chars"))
        )
        from debezium_incubator_ray.functions.kernels import collect_table

        t = collect_table(g, empty=pa.table({
            "lang": pa.array([], pa.string()),
            "n_docs": pa.array([], pa.int64()),
            "n_tokens": pa.array([], pa.int64()),
            "n_chars": pa.array([], pa.int64()),
        }))
        t = t.take(pc.sort_indices(t, sort_keys=[("lang", "ascending")]))

        def ratio6(num, den):
            # half-away 6dp of num/den, exact in int space
            return pa.array(
                [((2_000_000 * int(a)) + int(b)) // (2 * int(b)) / 1e6
                 for a, b in zip(num, den)], pa.float64(),
            )

        return pa.table({
            "lang": t["lang"],
            "n_docs": t["n_docs"],
            "n_tokens": t["n_tokens"],
            "chars_per_token": ratio6(t["n_chars"].to_pylist(),
                                      t["n_tokens"].to_pylist()),
            "tokens_per_doc": ratio6(t["n_tokens"].to_pylist(),
                                     t["n_docs"].to_pylist()),
        })

    def docs_length_by_lang_quantiles(sf_dir):
        """Per-language doc-length p50/p90/p99 (exact percentile_cont)
        — the corpus-card length profile. Reuses the shared
        quantiles_per_group kernel: one groupby, each (small) language
        group sorts once; at 100 TB the same shape swaps in a
        mergeable sketch (the kernel's documented scale path)."""
        import ray.data
        from debezium_incubator_ray.functions.windows import (
            quantiles_per_group,
        )

        import pyarrow as pa
        import pyarrow.compute as pc

        ds = ray.data.read_parquet(
            os.path.join(sf_dir, "documents.parquet"),
            columns=["lang", "n_chars"],
        )

        def drop_nulls(t: pa.Table) -> pa.Table:
            # the oracle's universe: lang and n_chars both non-null (a
            # null n_chars would NaN-poison the group's np.quantile)
            return t.filter(pc.and_(pc.is_valid(t["lang"]),
                                    pc.is_valid(t["n_chars"])))

        return quantiles_per_group(
            ds.map_batches(drop_nulls, batch_format="pyarrow",
                           zero_copy_batch=True),
            group_col="lang", value_col="n_chars", qs=(0.5, 0.9, 0.99),
        )

    def events_stl_decomposition(sf_dir):
        """STL-lite seasonal decomposition of the daily value series:
        trend = centered 7-day moving average over the ORDERED day
        sequence (only days with the full window), seasonal = mean
        detrended value per isodow, remainder = detrended - seasonal.
        Returns per-dow seasonal indices + the remainder RMS — the
        classic trend/seasonality split a forecaster starts from. Day
        totals fold distributed; the driver finish is O(days)."""
        import numpy as np
        import pyarrow as pa
        import pyarrow.compute as pc
        import ray.data
        from ray.data.aggregate import Sum

        ds = ray.data.read_parquet(
            os.path.join(sf_dir, "events.parquet"),
            columns=["ts", "value"],
        )
        US_D = 86_400_000_000

        def partial(t: pa.Table) -> pa.Table:
            ts = t["ts"].combine_chunks()
            v = t["value"].combine_chunks()
            keep = pc.and_(pc.is_valid(ts),
                           pc.and_(pc.is_valid(v),
                                   pc.invert(pc.is_nan(v))))
            ts = ts.filter(keep).cast(pa.int64()).to_numpy(
                zero_copy_only=False
            )
            vv = v.filter(keep).to_numpy(zero_copy_only=False)
            day = ts // US_D
            part = pa.table({
                "day": pa.array(day), "v": pa.array(vv),
            }).group_by("day").aggregate([("v", "sum")])
            return pa.table({"day": part["day"], "v": part["v_sum"]})

        rows = (
            ds.map_batches(partial, batch_format="pyarrow",
                           zero_copy_batch=True)
            .groupby("day")
            .aggregate(Sum("v", alias_name="v"))
            .take_all()
        )  # O(days)
        rows.sort(key=lambda r: r["day"])
        days = np.array([r["day"] for r in rows], np.int64)
        v = np.array([r["v"] for r in rows], np.float64)
        n = len(v)
        if n < 7:
            return pa.table({
                "dow": pa.array([], pa.int64()),
                "n_days": pa.array([], pa.int64()),
                "seasonal": pa.array([], pa.float64()),
                "remainder_rms": pa.array([], pa.float64()),
            })
        # centered 7-day MA over the ordered sequence (full windows only)
        trend = np.convolve(v, np.ones(7), mode="valid") / 7.0
        mid = np.arange(3, n - 3)
        det = v[mid] - trend
        dow = ((days[mid] + 3) % 7 + 1).astype(np.int64)
        ud = np.unique(dow)
        seas = np.array([det[dow == d].mean() for d in ud])
        rem = det - seas[np.searchsorted(ud, dow)]
        rms = float(np.sqrt((rem * rem).mean()))
        nd = np.array([(dow == d).sum() for d in ud], np.int64)
        return pa.table({
            "dow": pa.array(ud),
            "n_days": pa.array(nd),
            "seasonal": pa.array(np.round(seas, 6)),
            "remainder_rms": pa.array(
                np.full(len(ud), round(rms, 6)), pa.float64()
            ),
        })

    def dedup_threshold_curve(sf_dir):
        """Near-dup pair count as a function of the Jaccard threshold
        (0.1 .. 0.9) — the sensitivity curve a curation run sweeps
        before committing to a cutoff. ONE inverted-index pass scores
        every candidate pair (kernel threshold 0.05, safely under the
        curve's floor so boundary-rounding pairs are not pre-dropped);
        per-block partials fold 9 tiny (threshold, n) rows."""
        import numpy as np
        import pyarrow as pa
        import ray.data
        from ray.data.aggregate import Sum
        from debezium_incubator_ray.functions.dedup import (
            ngram_jaccard_pairs,
        )

        TAUS = np.round(np.arange(1, 10) * 0.1, 1)
        docs = ray.data.read_parquet(
            os.path.join(sf_dir, "documents.parquet"),
            columns=["doc_id", "text"],
        )
        pairs = ngram_jaccard_pairs(docs, threshold=0.05)

        def partial(t: pa.Table) -> pa.Table:
            j = t["jaccard"].combine_chunks().to_numpy(
                zero_copy_only=False
            )
            n = np.array([(j >= tau).sum() for tau in TAUS], np.int64)
            return pa.table({
                "threshold": pa.array(TAUS, pa.float64()),
                "n_pairs": pa.array(n),
            })

        g = (
            pairs.map_batches(partial, batch_format="pyarrow",
                              zero_copy_batch=True)
            .groupby("threshold")
            .aggregate(Sum("n_pairs", alias_name="n_pairs"))
        )
        import pyarrow.compute as pc
        from debezium_incubator_ray.functions.kernels import collect_table

        t = collect_table(g, empty=pa.table({
            "threshold": pa.array([], pa.float64()),
            "n_pairs": pa.array([], pa.int64()),
        }))
        # zero-pair thresholds still emit a row (mirror the oracle's
        # LEFT JOIN off the unnested tau list)
        seen = set(t["threshold"].to_pylist())
        missing = [float(x) for x in TAUS if float(x) not in seen]
        if missing:
            t = pa.concat_tables([t, pa.table({
                "threshold": pa.array(missing, pa.float64()),
                "n_pairs": pa.array([0] * len(missing), pa.int64()),
            })])
        return t.take(pc.sort_indices(t, sort_keys=[
            ("threshold", "ascending")
        ]))

    def orders_qoq_growth(sf_dir):
        """Quarter-over-quarter revenue: per calendar quarter, exact
        order-value cents totals and the QoQ growth percentage
        (rational -> half-away integer rounding on both sides; the
        first quarter reports NULL growth). Per-batch (quarter, cents)
        partials; one tiny quarter groupby; O(quarters) driver
        finish."""
        import numpy as np
        import pyarrow as pa
        import pyarrow.compute as pc
        import ray.data
        from ray.data.aggregate import Sum

        ds = ray.data.read_parquet(
            os.path.join(sf_dir, "orders.parquet"),
            columns=["o_orderdate", "o_totalprice"],
        )

        def partial(t: pa.Table) -> pa.Table:
            t = t.filter(pc.and_(pc.is_valid(t["o_orderdate"]),
                                 pc.is_valid(t["o_totalprice"])))
            od = t["o_orderdate"].combine_chunks().cast(
                pa.int64()
            ).to_numpy(zero_copy_only=False)
            # (year, quarter) from epoch-us via numpy datetime month
            months = od.astype("datetime64[us]").astype("datetime64[M]")
            y = months.astype("datetime64[Y]").astype(np.int64) + 1970
            m = (months.astype(np.int64) % 12) + 1
            q = (m - 1) // 3 + 1
            cents = pc.cast(
                pc.round(pc.multiply(t["o_totalprice"], 100.0)),
                pa.int64(),
            ).to_numpy(zero_copy_only=False)
            part = pa.table({
                "year": pa.array(y), "quarter": pa.array(q),
                "cents": pa.array(cents),
                "n": pa.array(np.ones(len(y), np.int64)),
            }).group_by(["year", "quarter"]).aggregate(
                [("cents", "sum"), ("n", "sum")]
            )
            return pa.table({
                "year": part["year"], "quarter": part["quarter"],
                "cents": part["cents_sum"], "n": part["n_sum"],
            })

        rows = (
            ds.map_batches(partial, batch_format="pyarrow",
                           zero_copy_batch=True)
            .groupby(["year", "quarter"])
            .aggregate(Sum("cents", alias_name="cents"),
                       Sum("n", alias_name="n"))
            .take_all()
        )  # O(quarters)
        rows.sort(key=lambda r: (r["year"], r["quarter"]))
        y = [r["year"] for r in rows]
        q = [r["quarter"] for r in rows]
        c = [int(r["cents"]) for r in rows]
        n = [r["n"] for r in rows]
        growth = [None]
        for i in range(1, len(c)):
            prev, cur = c[i - 1], c[i]
            # pct = 100 * (cur - prev) / prev, half-away 6dp, exact
            num = 100_000_000 * (cur - prev)
            a = (2 * abs(num) + prev) // (2 * prev)
            growth.append((a if num >= 0 else -a) / 1e6)
        return pa.table({
            "year": pa.array(y, pa.int64()),
            "quarter": pa.array(q, pa.int64()),
            "revenue": pa.array([v / 100.0 for v in c], pa.float64()),
            "n_orders": pa.array(n, pa.int64()),
            "qoq_growth_pct": pa.array(growth, pa.float64()),
        })

    def embedding_intrinsic_dim(sf_dir):
        """TwoNN intrinsic-dimension estimate (Facco et al. 2017) of
        the embedding corpus: ID = n / sum(ln(r2 / r1)) over each
        vector's two nearest neighbors. Per-batch rows compute their
        NN1/NN2 against the broadcast corpus matrix (block-pair
        matmuls — at 100 TB this runs on a uniform sample, the
        standard TwoNN recipe) and fold partial log-ratio sums; zero-
        distance duplicate pairs are excluded per the estimator."""
        import numpy as np
        import pyarrow as pa
        import pyarrow.compute as pc
        import pyarrow.parquet as pq
        import ray
        import ray.data
        from debezium_incubator_ray.functions.ann import _batch_matrix

        et = pq.read_table(os.path.join(sf_dir, "embeddings.parquet"),
                           columns=["vec_id", "embedding"])
        et = et.filter(pc.is_valid(et["embedding"]))
        ids_all = et["vec_id"].to_numpy(zero_copy_only=False)
        order = np.argsort(ids_all)
        M_all = _batch_matrix(et, "embedding").astype(np.float64)[order]
        ids_sorted = ids_all[order]
        ref2 = ray.put((M_all, ids_sorted))

        ds = ray.data.read_parquet(
            os.path.join(sf_dir, "embeddings.parquet"),
            columns=["vec_id", "embedding"],
        )

        def partial2(t: pa.Table) -> pa.Table:
            corpus, sid = ray.get(ref2)
            t = t.filter(pc.is_valid(t["embedding"]))
            B = _batch_matrix(t, "embedding").astype(np.float64)
            d2 = (
                (B * B).sum(axis=1, keepdims=True)
                - 2.0 * (B @ corpus.T)
                + (corpus * corpus).sum(axis=1)[None, :]
            )
            np.maximum(d2, 0.0, out=d2)
            ids = t["vec_id"].combine_chunks().to_numpy(
                zero_copy_only=False
            )
            rows_idx = np.arange(len(ids))
            d2[rows_idx, np.searchsorted(sid, ids)] = np.inf  # self
            p1 = np.argmin(d2, axis=1)
            r1 = d2[rows_idx, p1]
            d2[rows_idx, p1] = np.inf
            r2 = d2.min(axis=1)
            # duplicate NN excluded per TwoNN (the epsilon absorbs
            # float noise in the d2 algebra — an exact duplicate can
            # read ~1e-13, not 0.0, on either side); rows with no
            # SECOND neighbor (corpus of 2) have r2 = inf and are
            # outside the estimator, like the oracle's missing rn=2
            ok = (r1 > 1e-9) & np.isfinite(r2)
            # ln(r2/r1) = 0.5 * ln(d2_2 / d2_1) — identical algebra to
            # the oracle's 0.5 * ln(ratio of squared distances)
            term = 0.5 * np.log(r2[ok] / r1[ok])
            return pa.table({
                "s": pa.array([float(term.sum())], pa.float64()),
                "n": pa.array([int(ok.sum())], pa.int64()),
            })

        rows = ds.map_batches(partial2, batch_format="pyarrow",
                              zero_copy_batch=True).take_all()
        s = sum(r["s"] for r in rows)
        n = sum(r["n"] for r in rows)
        return pa.table({
            "n_vectors": pa.array([n], pa.int64()),
            "intrinsic_dim": pa.array(
                [round(n / s, 6) if s > 0 else None], pa.float64()
            ),
        })

    def text_bm25_index_topk(sf_dir):
        """BM25 top-20 through the PERSISTED inverted index: build the
        term-hash-bucketed index (atomic publish), then search reading
        ONLY the buckets the query terms hash to — the pruned-read
        contract (ann.build_ivf_index's text sibling). Must rank
        exactly like the in-memory text_bm25_topk row; the oracle is
        the same SQL."""
        import os as _os
        import uuid

        import ray.data
        from debezium_incubator_ray.functions.text import (
            build_text_index, text_index_topk,
        )

        docs = ray.data.read_parquet(
            os.path.join(sf_dir, "documents.parquet"),
            columns=["doc_id", "text"],
        )
        idx = _os.path.join(
            "/tmp", f"dbzray-tix-{_os.getpid()}-{uuid.uuid4().hex}"
        )
        try:
            build_text_index(docs, idx, buckets=32)
            return text_index_topk(idx, ("join", "vector", "stream"),
                                   k=20)
        finally:
            import shutil

            shutil.rmtree(idx, ignore_errors=True)

    def events_gini(sf_dir):
        """Gini coefficient of per-user event counts — activity
        concentration. Per-key counts fold narrow; the driver finish is
        bounded by DISTINCT count values (count-of-counts), exact
        integer rank sums."""
        import ray.data
        from debezium_incubator_ray.functions.stats import gini_coefficient

        ds = ray.data.read_parquet(
            os.path.join(sf_dir, "events.parquet"), columns=["user_id"],
        )
        return gini_coefficient(ds, "user_id")

    def events_changepoint(sf_dir):
        """CUSUM mean-shift screen: which day breaks the event-volume
        trend? Calendar-bounded daily fold, O(#days) driver finish,
        earliest-day tie-break."""
        import ray.data
        from debezium_incubator_ray.functions.stats import cusum_changepoint

        ds = ray.data.read_parquet(
            os.path.join(sf_dir, "events.parquet"), columns=["ts"],
        )
        return cusum_changepoint(ds, "ts")

    def events_autocorr(sf_dir):
        """Is event volume periodic? Lag-{1,2,3,7} autocorrelation of
        the daily event-count series — rows collapse to per-day counts
        inside each block, so the shuffle and the driver finish are
        bounded by the calendar span."""
        import ray.data
        from debezium_incubator_ray.functions.stats import autocorr_daily

        ds = ray.data.read_parquet(
            os.path.join(sf_dir, "events.parquet"), columns=["ts"],
        )
        return autocorr_daily(ds, "ts", lags=(1, 2, 3, 7))

    def stats_mann_whitney(sf_dir):
        """Mann-Whitney U (rank-sum, tie-corrected normal z): does
        quantity distribute differently for returned ('A') vs
        not-returned ('N') line items? Distinct-bounded count fold; the
        driver's rank sums are exact multiples of 0.5, digit-identical
        to the per-row SQL window rank sum."""
        import ray.data
        from debezium_incubator_ray.functions.stats import mann_whitney_u

        li = ray.data.read_parquet(
            os.path.join(sf_dir, "lineitem.parquet"),
            columns=["l_quantity", "l_returnflag"],
        )
        return mann_whitney_u(li, "l_quantity", "l_returnflag", "A", "N")

    def stats_kendall_tau(sf_dir):
        """Kendall tau-b (tie-corrected) between quantity and discount:
        per-block contingency partials fold to a 50x11 grid, concordant/
        discordant pairs come from 2-D suffix sums — exact int64, so the
        value is digit-identical to an exact SQL pair count."""
        import ray.data
        from debezium_incubator_ray.functions.stats import kendall_tau_b

        li = ray.data.read_parquet(
            os.path.join(sf_dir, "lineitem.parquet"),
            columns=["l_quantity", "l_discount"],
        )
        return kendall_tau_b(li, "l_quantity", "l_discount")

    def dq_chi2_independence(sf_dir):
        """Chi-square independence screen: is event_type independent of
        day-of-week? One streaming pass of per-block contingency partials
        (metadata-sized), closed-form finish."""
        import pyarrow as pa
        import pyarrow.compute as pc
        import ray.data
        from debezium_incubator_ray.functions.stats import (
            chi2_independence,
        )

        ds = ray.data.read_parquet(
            os.path.join(sf_dir, "events.parquet"),
            columns=["event_type", "ts"],
        )

        def add_dow(t: pa.Table) -> pa.Table:
            d = pc.cast(t["ts"].combine_chunks(), pa.int64())
            day = pc.divide(d, 86_400_000_000)
            # epoch day 0 = Thursday; DuckDB dayofweek: Sunday = 0
            dow = pc.subtract(
                pc.add(day, 4),
                pc.multiply(pc.divide(pc.add(day, 4), 7), 7),
            )
            return pa.table({
                "event_type": t["event_type"],
                "dow": pc.cast(dow, pa.int64()),
            })

        return chi2_independence(
            ds.map_batches(add_dow, batch_format="pyarrow",
                           zero_copy_batch=True),
            "event_type", "dow",
        )

    def text_gopher_rules(sf_dir):
        """Gopher-style quality gating (word count, mean word length,
        stopword fraction, top-word dominance) with per-rule pass bits —
        embarrassingly parallel, all Arrow kernels, no shuffle."""
        import ray.data
        from debezium_incubator_ray.functions.text import gopher_rules

        ds = ray.data.read_parquet(
            os.path.join(sf_dir, "documents.parquet"),
            columns=["doc_id", "text"],
        )
        return gopher_rules(ds)

    def join_min_price_supplier(sf_dir):
        """TPC-H Q2 shape (correlated min subquery + join-back) collapsed
        into one combiner pass: per part, the cheapest lineitem's price
        with the winning supplier (ties -> min suppkey) via group_argmin
        (per-block lexmin partials, one group-hash fold), then a
        broadcast join against the small supplier dimension."""
        import pyarrow as pa
        import pyarrow.compute as pc
        import pyarrow.parquet as _pq
        import ray.data
        from debezium_incubator_ray.functions.kernels import group_argmin
        from debezium_incubator_ray.functions.joins import broadcast_join

        li = ray.data.read_parquet(
            os.path.join(sf_dir, "lineitem.parquet"),
            columns=["l_partkey", "l_extendedprice", "l_suppkey"],
        )
        mins = group_argmin(
            li, "l_partkey", "l_extendedprice", "l_suppkey", buckets=32
        )
        sup = _pq.read_table(
            os.path.join(sf_dir, "supplier.parquet"),
            columns=["s_suppkey", "s_name"],
        )
        out = broadcast_join(mins, sup, on="l_suppkey", right_on="s_suppkey")
        return out.map_batches(
            lambda t: pa.table({
                "partkey": t["l_partkey"],
                "min_price": pc.round(t["l_extendedprice"], ndigits=2),
                "suppkey": t["l_suppkey"],
                "supplier": t["s_name"],
            }),
            batch_format="pyarrow",
        )

    def join_bloom_semi(sf_dir):
        """Bloom-prefiltered EXACT semi-join: lineitems of top-5%-price
        orders. The order-key Bloom bitmap (2^20 bits) broadcasts once
        and drops ~95% of lineitem rows BEFORE the shuffle; the exact
        left-semi shuffle_join kills the false positives, so results are
        byte-identical to the unfiltered semi-join at a fraction of the
        shuffle bytes. Finishes with per-returnflag revenue partials."""
        import pyarrow as pa
        import pyarrow.compute as pc
        import ray.data
        from ray.data.aggregate import Sum
        from debezium_incubator_ray.functions.joins import bloom_semi_join

        li = ray.data.read_parquet(
            os.path.join(sf_dir, "lineitem.parquet"),
            columns=["l_orderkey", "l_returnflag", "l_extendedprice"],
        )
        hi = ray.data.read_parquet(
            os.path.join(sf_dir, "orders.parquet"),
            columns=["o_orderkey", "o_totalprice"],
        ).filter(expr="o_totalprice > 475000.0")
        sel = bloom_semi_join(
            li, hi.select_columns(["o_orderkey"]),
            on="l_orderkey", right_on="o_orderkey", buckets=32,
        )

        def partial(t: pa.Table) -> pa.Table:
            g = t.group_by(["l_returnflag"]).aggregate(
                [("l_extendedprice", "sum"), ([], "count_all")]
            )
            return pa.table({
                "l_returnflag": g["l_returnflag"],
                "rev": g["l_extendedprice_sum"],
                "cnt": pc.cast(g["count_all"], pa.int64()),
            })

        out = (
            sel.map_batches(partial, batch_format="pyarrow",
                            zero_copy_batch=True)
            .groupby("l_returnflag")
            .aggregate(Sum("rev", alias_name="revenue"),
                       Sum("cnt", alias_name="n_items"))
        ).to_pandas()
        out["revenue"] = out["revenue"].round(2)
        return out

    def topk_per_group(sf_dir):
        """Top-5 events per event_type by value (ties by event_id) via the
        partial-top-k combiner — shuffle volume is k x groups x blocks."""
        import ray.data
        from debezium_incubator_ray.functions.windows import topk_per_group as tk

        ds = ray.data.read_parquet(
            os.path.join(sf_dir, "events.parquet"),
            columns=["event_type", "event_id", "value"],
        )
        return tk(ds, k=5)

    def topk_per_user(sf_dir):
        """Top-2 events per USER — the high-cardinality grouped top-k:
        per-block combiner (k rows per (block, user) survive), groups
        shuffle by hash(user) % buckets so the reduce runs per bounded
        bucket, never one task per user."""
        import ray.data
        from debezium_incubator_ray.functions.windows import (
            topk_per_group as tk,
        )

        ds = ray.data.read_parquet(
            os.path.join(sf_dir, "events.parquet"),
            columns=["user_id", "event_id", "value"],
        )
        return tk(ds, group_col="user_id", k=2, buckets=32)

    def quantiles_by_type(sf_dir):
        """Exact p50/p90/p99 of value per event_type (percentile_cont
        semantics, linear interpolation)."""
        import ray.data
        from debezium_incubator_ray.functions.windows import quantiles_per_group

        ds = ray.data.read_parquet(
            os.path.join(sf_dir, "events.parquet"),
            columns=["event_type", "value"],
        )
        return quantiles_per_group(ds)

    def asof_join_events(sf_dir):
        """LEFT as-of join: each even-id event picks the odd-id event of
        the same user with the greatest ts <= its ts (DuckDB ASOF JOIN is
        the oracle)."""
        import pyarrow.compute as pc
        import ray.data
        from debezium_incubator_ray.functions.joins import asof_join

        ev = ray.data.read_parquet(
            os.path.join(sf_dir, "events.parquet"),
            columns=["event_id", "user_id", "ts", "value"],
        )

        def side(parity):
            def f(t):
                m = pc.equal(pc.bit_wise_and(t["event_id"], 1), parity)
                return t.filter(m)
            return f

        left = ev.map_batches(side(0), batch_format="pyarrow", zero_copy_batch=True)
        right = ev.map_batches(side(1), batch_format="pyarrow", zero_copy_batch=True)
        return asof_join(
            left, right, "user_id", "ts",
            left_cols=["event_id", "value"],
            right_cols=["event_id", "value"],
        )

    def events_in_sessions(sf_dir):
        """Point-in-interval (range) join: every event joined to the
        session window containing it (sessions from sessionize — per-key
        non-overlapping intervals, the operator's documented assumption)."""
        import ray.data
        from debezium_incubator_ray.functions.joins import interval_join
        from debezium_incubator_ray.functions.windows import sessionize

        pts = ray.data.read_parquet(
            os.path.join(sf_dir, "events.parquet"),
            columns=["user_id", "ts", "event_id", "value"],
        )
        ivs = sessionize(
            ray.data.read_parquet(
                os.path.join(sf_dir, "events.parquet"),
                columns=["user_id", "ts", "value"],
            )
        )
        out = interval_join(
            pts, ivs, "user_id", "ts",
            "session_start", "session_end", ["n_events"],
        )
        return out.select_columns(
            ["event_id", "user_id", "ts", "value",
             "session_start", "session_end", "n_events"]
        )

    def dedup_exact(sf_dir):
        import ray.data
        from debezium_incubator_ray.functions.dedup import exact_dedup

        ds = ray.data.read_parquet(os.path.join(sf_dir, "documents.parquet"))
        doubled = ds.union(ray.data.read_parquet(os.path.join(sf_dir, "documents.parquet")))
        return exact_dedup(doubled, col="text", id_col="doc_id")

    def dedup_minhash(sf_dir):
        """LSH candidates (64 hashes, 32 bands x 2) + DISTRIBUTED exact-
        Jaccard verify at 0.5 — the oracle recomputes exact Jaccard over
        exploded shingles; band recall at j>=0.5 is 1 - 0.75^32 per pair."""
        import ray.data
        from debezium_incubator_ray.functions.dedup import (
            minhash_candidate_pairs, verify_jaccard,
        )

        docs = ray.data.read_parquet(
            os.path.join(sf_dir, "documents.parquet"), columns=["doc_id", "text"]
        )
        cand = minhash_candidate_pairs(docs)
        return verify_jaccard(cand, docs, threshold=0.5)

    def dedup_simhash(sf_dir):
        """Exact near-dup pairs with SimHash Hamming distance <= 3 via the
        4x16-bit pigeonhole buckets. Token hash = md5_u64 (the DuckDB
        bridge) so the oracle can recompute the signatures bit-for-bit."""
        import pyarrow.compute as pc
        import ray.data
        from debezium_incubator_ray.functions.dedup import simhash_near_dup_pairs
        from debezium_incubator_ray.functions.tokens import md5_u64

        docs = ray.data.read_parquet(
            os.path.join(sf_dir, "documents.parquet"), columns=["doc_id", "text"]
        )

        def nonempty(t):
            import pyarrow as pa

            keep = pc.greater(
                pc.utf8_length(pc.utf8_trim_whitespace(t["text"])), 0
            )
            return t.filter(keep)

        docs = docs.map_batches(nonempty, batch_format="pyarrow", zero_copy_batch=True)
        return simhash_near_dup_pairs(docs, max_hamming=3, hasher=md5_u64)

    def dedup_ngram_jaccard(sf_dir):
        """Exact all-pairs 3-gram Jaccard >= 0.3: inverted-index candidates
        (share >= 1 shingle) + distributed verify."""
        import ray.data
        from debezium_incubator_ray.functions.dedup import ngram_jaccard_pairs

        docs = ray.data.read_parquet(
            os.path.join(sf_dir, "documents.parquet"), columns=["doc_id", "text"]
        )
        return ngram_jaccard_pairs(docs, threshold=0.3)

    def dedup_containment(sf_dir):
        """Asymmetric near-dup: 3-gram containment |A∩B|/min(|A|,|B|)
        >= 0.5 — catches quotes/extracts Jaccard dilutes (a short doc
        embedded in a long page). Same one-pass inverted-index shuffle
        as dedup_ngram_jaccard; only the denominator changes."""
        import ray.data
        from debezium_incubator_ray.functions.dedup import ngram_jaccard_pairs

        docs = ray.data.read_parquet(
            os.path.join(sf_dir, "documents.parquet"), columns=["doc_id", "text"]
        )
        return ngram_jaccard_pairs(docs, threshold=0.5,
                                   score_mode="containment")

    def text_ngram_novelty(sf_dir):
        """Per-doc 3-gram novelty: the fraction of a doc's distinct
        shingles with corpus df = 1 — the inverse-boilerplate gauge
        (low = templated/copied, high = original). One inverted-index
        shuffle; df and the per-doc partials fold inside each shingle
        bucket; the driver never sees a row."""
        import ray.data
        from debezium_incubator_ray.functions.dedup import ngram_novelty

        docs = ray.data.read_parquet(
            os.path.join(sf_dir, "documents.parquet"),
            columns=["doc_id", "text"],
        )
        return ngram_novelty(docs)

    def stats_multi_regression(sf_dir):
        """Two-predictor OLS (extendedprice ~ quantity + discount) from
        one pass of ten cross-moment sums; the 3x3 normal equations
        solve by Cramer's rule with determinant expansions stated
        EXACTLY as the oracle's SQL, so both sides round identically."""
        import ray.data
        from debezium_incubator_ray.functions.stats import multi_regression

        li = ray.data.read_parquet(
            os.path.join(sf_dir, "lineitem.parquet"),
            columns=["l_extendedprice", "l_quantity", "l_discount"],
        )
        return multi_regression(li, "l_extendedprice", "l_quantity",
                                "l_discount")

    def sample_neyman(sf_dir):
        """Neyman-allocation stratified sample (300 total): stratum
        budgets proportional to N_h x S_h from the shared power-sum
        fold, selection by the shared Lehmer permutation — the
        variance-optimal survey design, deterministic at any
        parallelism."""
        import ray.data
        from debezium_incubator_ray.functions.sample import neyman_sample

        ev = ray.data.read_parquet(
            os.path.join(sf_dir, "events.parquet"),
            columns=["event_type", "event_id", "value"],
        )
        return neyman_sample(ev, "event_type", "value", "event_id",
                             total_k=300)

    def dedup_clusters(sf_dir):
        """Near-dup clustering: exact 3-gram-Jaccard >= 0.3 pairs →
        distributed connected components (min-label propagation) →
        (doc_id, cluster_id=min id in component, keep=canonical)."""
        import ray.data
        from debezium_incubator_ray.functions.dedup import near_dup_clusters

        docs = ray.data.read_parquet(
            os.path.join(sf_dir, "documents.parquet"), columns=["doc_id", "text"]
        )
        return near_dup_clusters(docs, threshold=0.3)

    def dedup_keep_best(sf_dir):
        """Quality-aware near-dup dedup: per >= 0.3-Jaccard cluster keep
        the LONGEST doc (ties -> min id) — the crawl keep-best policy.
        Cluster labels broadcast (dup-graph-sized); the corpus streams
        once; winner = one group_argmin combiner pass."""
        import ray.data
        from debezium_incubator_ray.functions.dedup import (
            keep_best_per_cluster,
        )

        docs = ray.data.read_parquet(
            os.path.join(sf_dir, "documents.parquet"),
            columns=["doc_id", "text", "n_chars"],
        )
        return keep_best_per_cluster(docs, "n_chars", threshold=0.3)

    def dedup_embedding(sf_dir):
        import ray.data
        from debezium_incubator_ray.functions.dedup import embedding_near_dup_pairs

        ds = ray.data.read_parquet(os.path.join(sf_dir, "embeddings.parquet"))
        return embedding_near_dup_pairs(ds, tau=0.4)

    def dedup_embedding_lsh(sf_dir):
        """The APPROXIMATE embedding-dedup scale path, driver-gated:
        banded hyperplane LSH (16 axis-aligned planes x 4 bands — bit j =
        embedding[j] > 0, so DuckDB recomputes the band buckets
        bit-for-bit) + exact float64 cosine verify INSIDE each bucket.
        Candidates = pairs sharing any band; output (a, b, cos>=0.4).
        Unlike dedup_embedding's exact O(n^2) block pairs, compute here
        is sum-of-bucket-sizes-squared — the 100 TB path."""
        import ray.data
        from debezium_incubator_ray.functions.dedup import (
            embedding_near_dup_pairs_lsh,
        )

        ds = ray.data.read_parquet(
            os.path.join(sf_dir, "embeddings.parquet"),
            columns=["vec_id", "embedding"],
        )
        return embedding_near_dup_pairs_lsh(
            ds, tau=0.4, dim=64, n_planes=16, bands=4, axis_aligned=True,
        )

    def dedup_exact_semijoin(sf_dir):
        """dedup_exact with the declared too-big-to-broadcast winner
        filter forced: instead of collecting winner ids to the driver,
        winners and source rows meet in a partitioned LEFT SEMI hash
        join (id-hash buckets) — nothing materializes driver-side. Same
        oracle as dedup_exact; pins the scale path's behavior."""
        import ray.data
        from debezium_incubator_ray.functions.dedup import exact_dedup

        ds = ray.data.read_parquet(os.path.join(sf_dir, "documents.parquet"))
        doubled = ds.union(
            ray.data.read_parquet(os.path.join(sf_dir, "documents.parquet"))
        )
        return exact_dedup(doubled, col="text", id_col="doc_id",
                           winner_filter="semijoin")

    def dedup_keep_best_shuffle(sf_dir):
        """dedup_keep_best with the distributed label path forced: the
        (doc -> cluster) labels attach via the partitioned hash join
        instead of a driver broadcast — the web-corpus shape where
        near-dup labels are corpus-scale. Same oracle as
        dedup_keep_best; pins branch equivalence at the driver gate."""
        import ray.data
        from debezium_incubator_ray.functions.dedup import (
            keep_best_per_cluster,
        )

        docs = ray.data.read_parquet(
            os.path.join(sf_dir, "documents.parquet"),
            columns=["doc_id", "text", "n_chars"],
        )
        return keep_best_per_cluster(docs, "n_chars", threshold=0.3,
                                     label_mode="shuffle")

    def multimodal_decode(sf_dir):
        """REAL multimodal metadata decode (no codec libs needed):
        deterministic PNG/BMP/WAV payloads are synthesized per batch from
        doc_id (functions/multimodal.py synth_media_payloads — real
        container bytes, zero CRCs), then the vectorized header parser
        recovers width/height/channels/bit_depth/sample_rate/n_samples
        from the raw bytes. The oracle restates the generator formulas in
        SQL, so a wrong parse offset or endianness breaks the row."""
        import numpy as np
        import pyarrow as pa
        import ray.data
        from debezium_incubator_ray.functions.multimodal import (
            MediaHeaderParser, synth_media_payloads,
        )

        docs = ray.data.read_parquet(
            os.path.join(sf_dir, "documents.parquet"), columns=["doc_id"]
        )

        def add_payload(t: pa.Table) -> pa.Table:
            ids = t["doc_id"].combine_chunks().to_numpy(zero_copy_only=False)
            return t.append_column("payload", synth_media_payloads(ids))

        return docs.map_batches(
            add_payload, batch_format="pyarrow", zero_copy_batch=True
        ).map_batches(
            MediaHeaderParser,
            fn_constructor_kwargs={"payload_col": "payload"},
            batch_format="pyarrow",
            zero_copy_batch=True,
            batch_size=4096,
            concurrency=(1, 4),
        )

    def docs_hash_split(sf_dir):
        """Deterministic leakage-safe train/val/test split (80/10/10) by
        id hash — same id lands in the same split on every run and shard
        order. Pure map, zero shuffle; md5-bridge hash so DuckDB
        reproduces the assignment bit-for-bit."""
        import ray.data
        from debezium_incubator_ray.functions.sample import hash_split

        docs = ray.data.read_parquet(
            os.path.join(sf_dir, "documents.parquet"),
            columns=["doc_id", "lang"],
        )
        return hash_split(docs, id_col="doc_id")

    def events_watermark_late(sf_dir):
        """Streaming-watermark audit in batch: processing order =
        event_id (the arrival log); watermark after each event =
        running max event-time - 5 min; an event is late iff its
        event-time is under the watermark induced by its predecessors.
        Distributed via the two-pass prefix-max scan (range partials +
        driver exclusive fold + broadcast)."""
        import ray.data
        from debezium_incubator_ray.functions.windows import (
            watermark_late_flags,
        )

        ev = ray.data.read_parquet(
            os.path.join(sf_dir, "events.parquet"),
            columns=["event_id", "ts"],
        )
        return watermark_late_flags(ev)

    def text_heavy_hitters(sf_dir):
        """EXACT top-20 tokens by the two-pass Misra-Gries heavy-hitters
        shape: bounded-width per-block sketches elect candidates
        (metadata-sized union), then one streaming pass counts ONLY the
        candidates exactly — the corpus never shuffles. width=2048 over
        the ~1k-token vocabulary makes pass 1 lossless, so the result is
        the exact top-k the oracle computes."""
        import ray.data
        from debezium_incubator_ray.functions.sketch import heavy_hitters
        from debezium_incubator_ray.functions.tokens import flat_tokens

        docs = ray.data.read_parquet(
            os.path.join(sf_dir, "documents.parquet"), columns=["text"]
        )

        def explode(t):
            toks, _ = flat_tokens(t["text"].combine_chunks())
            return toks

        return heavy_hitters(docs, explode, k=20, width=2048)

    def windowed_agg_on_time(sf_dir):
        """The streaming-window-with-allowed-lateness composition: hourly
        (window, event_type) sums over ONLY the on-time events — late
        arrivals (event-time below the watermark their predecessors
        induced) are dropped exactly as a streaming engine's closed
        window would drop them. Flags come from the distributed
        prefix-max scan with the payload carried through (no join back);
        the aggregate is the standard partial-sum groupby."""
        import pyarrow as pa
        import pyarrow.compute as pc
        import ray.data
        from ray.data.aggregate import Count, Sum
        from debezium_incubator_ray.functions.windows import (
            watermark_late_flags,
        )

        ev = ray.data.read_parquet(
            os.path.join(sf_dir, "events.parquet"),
            columns=["event_id", "ts", "event_type", "value"],
        )
        flagged = watermark_late_flags(
            ev, carry_cols=("event_type", "value")
        )

        def on_time_window(t: pa.Table) -> pa.Table:
            keep = pc.invert(t["is_late"].combine_chunks())
            s = t.filter(keep)
            return pa.table({
                "window": pc.cast(
                    pc.divide(s["ts_us"].combine_chunks(), 3_600_000_000),
                    pa.int64(),
                ),
                "event_type": s["event_type"],
                "value": s["value"],
            })

        agg = (
            flagged.map_batches(on_time_window, batch_format="pyarrow",
                                zero_copy_batch=True)
            .groupby(["window", "event_type"])
            .aggregate(Sum("value", alias_name="total_value"),
                       Count(alias_name="n"))
        )

        def finish(t: pa.Table) -> pa.Table:
            return pa.table({
                "window": t["window"],
                "event_type": t["event_type"],
                "total_value": pc.round(t["total_value"], ndigits=3),
                "n": pc.cast(t["n"], pa.int64()),
            })

        return agg.map_batches(finish, batch_format="pyarrow")

    def docs_resumable_write(sf_dir):
        """Resumable partitioned output: documents land as one parquet
        directory per md5 key bucket with per-bucket commit markers — the
        unit of retry for a failed 100 TB write is a bucket, not the job
        (functions/output.py; the skip-committed re-run law is pinned by
        pytest). Gate pins the bucket assignment + per-bucket row counts
        via the SQL-reproducible md5 bridge."""
        import os as _os
        import shutil as _shutil
        import ray.data
        from debezium_incubator_ray.functions.output import resumable_write

        docs = ray.data.read_parquet(
            os.path.join(sf_dir, "documents.parquet"),
            columns=["doc_id", "text"],
        )
        # pid-scoped path: concurrent runs over the same sf dir (sweep
        # and bench in parallel) must not race each other's buckets.
        # Sweep dead pids' leftovers so repeated runs don't accumulate
        # full table copies in /tmp.
        parent = _os.path.join("/tmp", "dbzray-resumable-gate")
        base = _os.path.basename(_os.path.normpath(sf_dir))
        if _os.path.isdir(parent):
            for d in _os.listdir(parent):
                pid = d.rsplit("-", 1)[-1]
                if pid.isdigit() and not _os.path.exists(f"/proc/{pid}"):
                    _shutil.rmtree(_os.path.join(parent, d),
                                   ignore_errors=True)
        out = _os.path.join(parent, f"{base}-{_os.getpid()}")
        _shutil.rmtree(out, ignore_errors=True)
        return resumable_write(docs, out, "doc_id", buckets=16)

    def dedup_cross_split_leakage(sf_dir):
        """Split-leakage audit: near-dup pairs (3-gram Jaccard >= 0.3)
        whose two docs landed in DIFFERENT hash splits — exactly the
        pairs that leak training text into eval. Pairs come from the
        inverted-index machinery; the split of each side is a pure
        function of its id (the md5 bridge), so it attaches per batch
        with NO join — the pair stream never reshuffles."""
        import pyarrow as pa
        import pyarrow.compute as pc
        import ray.data
        from debezium_incubator_ray.functions.dedup import ngram_jaccard_pairs
        from debezium_incubator_ray.functions.sample import split_labels

        docs = ray.data.read_parquet(
            os.path.join(sf_dir, "documents.parquet"),
            columns=["doc_id", "text"],
        )
        pairs = ngram_jaccard_pairs(docs, threshold=0.3)

        def leaks(t: pa.Table) -> pa.Table:
            sa = split_labels(t["a"])
            sb = split_labels(t["b"])
            out = pa.table({
                "a": t["a"], "b": t["b"], "jaccard": t["jaccard"],
                "split_a": sa, "split_b": sb,
            })
            return out.filter(pc.invert(pc.equal(sa, sb)))

        return pairs.map_batches(leaks, batch_format="pyarrow",
                                 zero_copy_batch=True)

    def events_hll_by_type(sf_dir):
        """Per-event-type HLL distinct-user estimates — the grouped
        mergeable-sketch shape (audience size per segment). Deterministic
        md5-bridge registers; per-block (group, bucket, max-rho) partials
        max-fold in one distributed groupby; the SQL oracle recomputes
        the registers bit-for-bit per group."""
        import ray.data
        from debezium_incubator_ray.functions.sketch import hll_grouped

        ev = ray.data.read_parquet(
            os.path.join(sf_dir, "events.parquet"),
            columns=["event_type", "user_id"],
        )
        return hll_grouped(ev, "event_type", "user_id")

    def dedup_minhash_estimate(sf_dir):
        """MinHash-ESTIMATED Jaccard per shingle-sharing pair — the
        verification skip taken at 100 TB (est = matching positions /
        n_hashes, sd ~ 1/4 at 16 hashes). The hash family is md5-bridge
        + fixed affine transforms, so DuckDB recomputes every signature
        position bit-for-bit — the oracle checks the ESTIMATOR itself,
        not just its inputs."""
        import ray.data
        from debezium_incubator_ray.functions.dedup import (
            minhash_estimate_pairs,
        )

        docs = ray.data.read_parquet(
            os.path.join(sf_dir, "documents.parquet"),
            columns=["doc_id", "text"],
        )
        return minhash_estimate_pairs(docs, n_hashes=16, min_matches=8)

    def docs_shingle_df_histogram(sf_dir):
        """Histogram of shingle document frequencies on a log2 grid —
        the boilerplate gauge over the whole corpus (a fat df tail =
        templated text shared by many pages). ONE inverted-index shuffle
        computes df per shingle inside its bucket; per-bucket histogram
        partials (<= 64 rows each) fold in a tiny groupby."""
        import numpy as np
        import pyarrow as pa
        import pyarrow.compute as pc
        import ray.data
        from ray.data.aggregate import Sum
        from debezium_incubator_ray.functions.tokens import (
            shingle_hashes, distinct_per_doc,
        )
        from debezium_incubator_ray.hashing import stable_hash

        docs = ray.data.read_parquet(
            os.path.join(sf_dir, "documents.parquet"),
            columns=["doc_id", "text"],
        )

        def explode(t: pa.Table) -> pa.Table:
            g, glens = shingle_hashes(t["text"].combine_chunks(), 3,
                                      stable_hash)
            dv, dc = distinct_per_doc(g, glens)
            return pa.table({
                "g": pa.array(dv.view(np.int64)),
                "_bucket": pa.array((dv % np.uint64(64)).astype(np.int32)),
            })

        def bucket_hist(t: pa.Table) -> pa.Table:
            g = t["g"].combine_chunks().to_numpy(zero_copy_only=False)
            g = np.sort(g)
            if len(g) == 0:
                return pa.table({"df_bucket": pa.array([], pa.int64()),
                                 "n_shingles": pa.array([], pa.int64())})
            new = np.ones(len(g), dtype=bool)
            new[1:] = g[1:] != g[:-1]
            starts = np.nonzero(new)[0]
            df = np.diff(np.append(starts, len(g)))
            # log2 bucket: 1, 2, 3-4, 5-8, ... (floor(log2(df-? )) grid)
            db = np.int64(np.floor(np.log2(df)))
            vals, cnts = np.unique(db, return_counts=True)
            return pa.table({
                "df_bucket": pa.array(vals.astype(np.int64)),
                "n_shingles": pa.array(cnts.astype(np.int64)),
            })

        folded = (
            docs.map_batches(explode, batch_format="pyarrow",
                             zero_copy_batch=True)
            .groupby("_bucket")
            .map_groups(bucket_hist, batch_format="pyarrow")
            .groupby("df_bucket")
            .aggregate(Sum("n_shingles", alias_name="n_shingles"))
        )
        return folded.map_batches(
            lambda t: pa.table({
                "df_bucket": t["df_bucket"],
                "n_shingles": pc.cast(t["n_shingles"], pa.int64()),
            }),
            batch_format="pyarrow",
        )

    def dedup_substring_rate(sf_dir):
        """Substring-level duplication (the EXACTSUBSTR signal of Lee et
        al. 2021, simplified from suffix arrays to fixed 30-char
        windows): per doc, the fraction of its DISTINCT char 30-grams
        that occur in >= 2 docs. One rolling-hash pass per batch, only
        (gram_hash, doc_id) rows shuffle — bucketed by hash, never
        per-gram groups, never the text."""
        import ray.data
        from debezium_incubator_ray.functions.dedup import (
            dup_substring_rate,
        )

        docs = ray.data.read_parquet(
            os.path.join(sf_dir, "documents.parquet"),
            columns=["doc_id", "text"],
        )
        return dup_substring_rate(docs, k=30)

    def dedup_survivorship(sf_dir):
        """Dedup impact report per source: docs before, exact-dedup
        winners kept, and the survival rate — the "which feeds are
        mostly copies" diagnostic every ingest review starts with.
        Composition of the 24-byte hash-only winner election with a
        per-source fold; text never shuffles."""
        import pyarrow as pa
        import pyarrow.compute as pc
        import ray.data
        from ray.data.aggregate import Sum
        from debezium_incubator_ray.functions.dedup import exact_dedup

        docs = ray.data.read_parquet(
            os.path.join(sf_dir, "documents.parquet"),
            columns=["doc_id", "text", "source"],
        )
        kept = exact_dedup(docs, col="text", id_col="doc_id",
                           unique_ids=True)

        def tag(keep_flag):
            def f(t: pa.Table) -> pa.Table:
                g = t.group_by("source").aggregate([([], "count_all")])
                n = pc.cast(g["count_all"], pa.int64())
                z = pa.array(
                    [0] * g.num_rows, pa.int64()
                )
                return pa.table({
                    "source": g["source"],
                    "n_docs": z if keep_flag else n,
                    "n_kept": n if keep_flag else z,
                })
            return f

        both = docs.map_batches(
            tag(False), batch_format="pyarrow", zero_copy_batch=True
        ).union(kept.map_batches(
            tag(True), batch_format="pyarrow", zero_copy_batch=True
        ))
        folded = both.groupby("source").aggregate(
            Sum("n_docs", alias_name="n_docs"),
            Sum("n_kept", alias_name="n_kept"),
        )

        def finish(t: pa.Table) -> pa.Table:
            return pa.table({
                "source": t["source"],
                "n_docs": pc.cast(t["n_docs"], pa.int64()),
                "n_kept": pc.cast(t["n_kept"], pa.int64()),
                "survival_rate": pc.round(pc.divide(
                    pc.cast(t["n_kept"], pa.float64()),
                    pc.cast(t["n_docs"], pa.float64()),
                ), 6),
            })

        return folded.map_batches(finish, batch_format="pyarrow")

    def embedding_norm_histogram(sf_dir):
        """Histogram of embedding L2 norms on a 0.25-wide grid — the
        embedding-health screen (collapsed or exploding norms signal a
        bad encoder run) ahead of any cosine-based dedup/ANN. Per-batch
        bucket partials fold in one tiny groupby; norms round to 6dp
        before bucketing so engine and oracle floor identically."""
        import numpy as np
        import pyarrow as pa
        import pyarrow.compute as pc
        import ray.data
        from ray.data.aggregate import Sum
        from debezium_incubator_ray.functions.ann import _batch_matrix

        ds = ray.data.read_parquet(
            os.path.join(sf_dir, "embeddings.parquet"),
            columns=["vec_id", "embedding"],
        )

        def partial(t: pa.Table) -> pa.Table:
            t = t.filter(pc.is_valid(t["embedding"]))
            if t.num_rows == 0:
                return pa.table({"norm_bucket": pa.array([], pa.int64()),
                                 "n": pa.array([], pa.int64())})
            M = _batch_matrix(t, "embedding").astype(np.float64)
            norms = np.round(np.sqrt((M * M).sum(axis=1)), 6)
            b = np.floor(norms / 0.25).astype(np.int64)
            vals, cnts = np.unique(b, return_counts=True)
            return pa.table({
                "norm_bucket": pa.array(vals),
                "n": pa.array(cnts.astype(np.int64)),
            })

        folded = (
            ds.map_batches(partial, batch_format="pyarrow",
                           zero_copy_batch=True)
            .groupby("norm_bucket")
            .aggregate(Sum("n", alias_name="n"))
        )
        return folded.map_batches(
            lambda t: pa.table({
                "norm_bucket": t["norm_bucket"],
                "n": pc.cast(t["n"], pa.int64()),
            }),
            batch_format="pyarrow",
        )

    def events_burstiness(sf_dir):
        """Per-user interarrival burstiness B = (sd - mean)/(sd + mean)
        over consecutive event-time gaps (Goh-Barabasi) — periodic -1,
        Poisson ~0, bursty -> 1. One bucketed shuffle per user history;
        vectorized per-key two-pass moments in-bucket."""
        import ray.data
        from debezium_incubator_ray.functions.stats import (
            interarrival_burstiness,
        )

        ev = ray.data.read_parquet(
            os.path.join(sf_dir, "events.parquet"),
            columns=["user_id", "ts"],
        )
        return interarrival_burstiness(ev)

    def events_session_count_hist(sf_dir):
        """Distribution of sessions-per-user (30-min gap rule) — the
        engagement-shape histogram product teams track release over
        release. Composes sessionize (per-key gap windows) with two tiny
        folds: sessions per user, then users per session-count."""
        import pyarrow as pa
        import pyarrow.compute as pc
        import ray.data
        from ray.data.aggregate import Count
        from debezium_incubator_ray.functions.windows import sessionize

        ev = ray.data.read_parquet(
            os.path.join(sf_dir, "events.parquet"),
            columns=["user_id", "ts", "value"],
        )
        sessions = sessionize(ev)
        per_user = sessions.groupby("user_id").aggregate(
            Count(alias_name="n_sessions")
        )

        def cast_cnt(t: pa.Table) -> pa.Table:
            return pa.table({
                "n_sessions": pc.cast(t["n_sessions"], pa.int64()),
            })

        hist = (
            per_user.map_batches(cast_cnt, batch_format="pyarrow")
            .groupby("n_sessions")
            .aggregate(Count(alias_name="n_users"))
        )
        return hist.map_batches(
            lambda t: pa.table({
                "n_sessions": t["n_sessions"],
                "n_users": pc.cast(t["n_users"], pa.int64()),
            }),
            batch_format="pyarrow",
        )

    def embedding_centroid_angle_hist(sf_dir):
        """Histogram of each vector's cosine to the corpus centroid on a
        0.1 grid — the isotropy/anisotropy screen (a mass near 1 means a
        dominant direction, the classic contextual-embedding pathology).
        Two streaming passes: a dim-sized mean fold (broadcast once),
        then per-batch cosines with tiny histogram partials."""
        import numpy as np
        import pyarrow as pa
        import pyarrow.compute as pc
        import ray
        import ray.data
        from ray.data.aggregate import Sum
        from debezium_incubator_ray.functions.ann import _batch_matrix

        ds = ray.data.read_parquet(
            os.path.join(sf_dir, "embeddings.parquet"),
            columns=["vec_id", "embedding"],
        )

        def sum_partial(t: pa.Table) -> pa.Table:
            t = t.filter(pc.is_valid(t["embedding"]))
            if t.num_rows == 0:
                return pa.table({"i": pa.array([], pa.int64()),
                                 "s": pa.array([], pa.float64()),
                                 "n": pa.array([], pa.int64())})
            M = _batch_matrix(t, "embedding").astype(np.float64)
            return pa.table({
                "i": pa.array(np.arange(M.shape[1], dtype=np.int64)),
                "s": pa.array(M.sum(axis=0)),
                "n": pa.array(np.full(M.shape[1], M.shape[0], np.int64)),
            })

        dims = (
            ds.map_batches(sum_partial, batch_format="pyarrow",
                           zero_copy_batch=True)
            .groupby("i")
            .aggregate(Sum("s", alias_name="s"), Sum("n", alias_name="n"))
            .take_all()
        )  # one row per dimension — tiny
        dims.sort(key=lambda r: r["i"])
        mean = np.array([r["s"] / r["n"] for r in dims], dtype=np.float64)
        ref = ray.put(mean)

        def hist_partial(t: pa.Table) -> pa.Table:
            c = ray.get(ref)
            t = t.filter(pc.is_valid(t["embedding"]))
            if t.num_rows == 0:
                return pa.table({"cos_bucket": pa.array([], pa.int64()),
                                 "n": pa.array([], pa.int64())})
            M = _batch_matrix(t, "embedding").astype(np.float64)
            dot = M @ c
            vv = (M * M).sum(axis=1)
            mm = float((c * c).sum())
            cos = np.round(dot / np.sqrt(vv * mm), 6)
            b = np.floor(cos / 0.1).astype(np.int64)
            vals, cnts = np.unique(b, return_counts=True)
            return pa.table({
                "cos_bucket": pa.array(vals),
                "n": pa.array(cnts.astype(np.int64)),
            })

        folded = (
            ds.map_batches(hist_partial, batch_format="pyarrow",
                           zero_copy_batch=True)
            .groupby("cos_bucket")
            .aggregate(Sum("n", alias_name="n"))
        )
        return folded.map_batches(
            lambda t: pa.table({
                "cos_bucket": t["cos_bucket"],
                "n": pc.cast(t["n"], pa.int64()),
            }),
            batch_format="pyarrow",
        )

    def docs_split_balance(sf_dir):
        """Split-balance audit: docs and tokens per train/val/test split
        — the representativeness check run right after a hash split (a
        split can be count-balanced yet token-skewed). Pure map + one
        3-row fold; shares round to 6dp."""
        import pyarrow as pa
        import pyarrow.compute as pc
        import ray.data
        from ray.data.aggregate import Count, Sum
        from debezium_incubator_ray.functions.sample import hash_split
        from debezium_incubator_ray.functions.text import token_count

        docs = ray.data.read_parquet(
            os.path.join(sf_dir, "documents.parquet"),
            columns=["doc_id", "text"],
        )
        tagged = hash_split(docs).map_batches(
            lambda t: token_count(t).select(["doc_id", "n_tokens"])
            .append_column("split", t["split"]),
            batch_format="pyarrow", zero_copy_batch=True,
        )
        folded = tagged.groupby("split").aggregate(
            Count(alias_name="n_docs"),
            Sum("n_tokens", alias_name="n_tokens"),
        )

        def finish(t: pa.Table) -> pa.Table:
            toks = pc.cast(t["n_tokens"], pa.float64())
            total = pc.sum(toks).as_py() or 0.0
            return pa.table({
                "split": t["split"],
                "n_docs": pc.cast(t["n_docs"], pa.int64()),
                "n_tokens": pc.cast(t["n_tokens"], pa.int64()),
                "token_share": pc.round(pc.divide(toks, total), 6),
            })

        from debezium_incubator_ray.functions.kernels import collect_table

        return finish(collect_table(folded, empty=pa.table({
            "split": pa.array([], pa.string()),
            "n_docs": pa.array([], pa.int64()),
            "n_tokens": pa.array([], pa.int64()),
        })))

    def orders_basket_size_hist(sf_dir):
        """Distribution of lineitems per order — the basket-size
        histogram behind packing/pricing analyses. Per-batch
        (orderkey, count) partials fold once; the second fold is
        |distinct sizes| rows."""
        import pyarrow as pa
        import pyarrow.compute as pc
        import ray.data
        from ray.data.aggregate import Count, Sum

        li = ray.data.read_parquet(
            os.path.join(sf_dir, "lineitem.parquet"),
            columns=["l_orderkey"],
        )

        def partial(t: pa.Table) -> pa.Table:
            g = t.group_by("l_orderkey").aggregate([([], "count_all")])
            return pa.table({
                "l_orderkey": g["l_orderkey"],
                "n": pc.cast(g["count_all"], pa.int64()),
            })

        per_order = (
            li.map_batches(partial, batch_format="pyarrow",
                           zero_copy_batch=True)
            .groupby("l_orderkey")
            .aggregate(Sum("n", alias_name="basket_size"))
        )

        def cast_size(t: pa.Table) -> pa.Table:
            return pa.table({
                "basket_size": pc.cast(t["basket_size"], pa.int64()),
            })

        hist = (
            per_order.map_batches(cast_size, batch_format="pyarrow")
            .groupby("basket_size")
            .aggregate(Count(alias_name="n_orders"))
        )
        return hist.map_batches(
            lambda t: pa.table({
                "basket_size": t["basket_size"],
                "n_orders": pc.cast(t["n_orders"], pa.int64()),
            }),
            batch_format="pyarrow",
        )

    def text_token_len_histogram(sf_dir):
        """Corpus-level token-LENGTH histogram (chars per token) — the
        tokenizer-health stat (a fat long-token tail means URLs/garbage
        dominating subword budgets). Flat-token lengths fold to <= ~40
        partial rows per block; one tiny groupby finishes."""
        import numpy as np
        import pyarrow as pa
        import pyarrow.compute as pc
        import ray.data
        from ray.data.aggregate import Sum
        from debezium_incubator_ray.functions.tokens import flat_tokens

        docs = ray.data.read_parquet(
            os.path.join(sf_dir, "documents.parquet"), columns=["text"]
        )

        def partial(t: pa.Table) -> pa.Table:
            toks, _ = flat_tokens(t["text"].combine_chunks())
            if len(toks) == 0:
                return pa.table({"token_len": pa.array([], pa.int64()),
                                 "n": pa.array([], pa.int64())})
            lens = pc.utf8_length(toks).to_numpy(zero_copy_only=False)
            vals, cnts = np.unique(lens, return_counts=True)
            return pa.table({
                "token_len": pa.array(vals.astype(np.int64)),
                "n": pa.array(cnts.astype(np.int64)),
            })

        folded = (
            docs.map_batches(partial, batch_format="pyarrow",
                             zero_copy_batch=True)
            .groupby("token_len")
            .aggregate(Sum("n", alias_name="n"))
        )
        return folded.map_batches(
            lambda t: pa.table({
                "token_len": t["token_len"],
                "n": pc.cast(t["n"], pa.int64()),
            }),
            batch_format="pyarrow",
        )

    def docs_curation_pipeline(sf_dir):
        """The composed training-data pass (pipelines/curate.py): exact
        dedup → quality gates → stratified sample, one streaming pipeline
        with a single 24-byte-per-row shuffle. End-to-end oracle guards
        stage ordering, not just per-stage correctness."""
        import ray.data

        from debezium_incubator_ray.pipelines.curate import curate

        docs = ray.data.read_parquet(
            os.path.join(sf_dir, "documents.parquet"),
            columns=["doc_id", "text", "lang"],
        )
        out = curate(
            docs,
            rates={"en": 0.8, "zh": 0.5, "es": 0.3},
            default_rate=0.1,
            min_tokens=20,
            max_mean_token_len=12.0,
            max_punct_ratio=0.1,
            langs=("en", "de", "fr", "es", "zh"),
        )
        return out.select_columns(["doc_id", "lang", "n_tokens", "n_chars"])

    def cdc_secondary_index(sf_dir):
        """Secondary-index maintenance from the primary change stream: the
        stream is re-keyed onto (event_type, user_id) — updates that change
        event_type become delete+create pairs (pipelines/derive.py) — and
        applied into a composite-key lake. Oracle: the primary LWW state's
        (event_type, user_id, lsn) projection."""
        import pyarrow as pa
        from debezium_incubator_ray import schema as S
        from debezium_incubator_ray.pipelines import events_cdc as EC
        from debezium_incubator_ray.pipelines.derive import (
            derive_rekeyed_envelopes,
        )

        root = EC.scratch_dir("sidx")
        binlog, lake = os.path.join(root, "binlog"), os.path.join(root, "lake")
        env = EC.events_envelopes(sf_dir, delete_aware=True)
        idx_schema = pa.schema(
            [pa.field("event_type", pa.string()),
             pa.field("user_id", pa.int64(), nullable=False)]
        )
        derived = derive_rekeyed_envelopes(
            env, idx_schema, ("event_type", "user_id")
        )
        EC.write_env_binlog(derived, binlog, num_partitions=1)
        eng = EC.make_engine(
            lake, key_cols=("event_type", "user_id"), payload_schema=idx_schema
        )
        eng.run(binlog)
        out = eng.lake_table(include_lsn=True)
        i = out.schema.get_field_index(S.LSN)
        return out.set_column(i, pa.field("lsn", pa.int64()), out[S.LSN])

    def cdc_prefix_lookup(sf_dir):
        """Cassandra partition read over a composite-key lake: the
        (event_type, user_id) secondary index is prefix-read with
        lookup_prefix(('click',)) — only sorted runs whose
        [min_key, max_key] intersects the 'click|' prefix range are
        opened, rows exactly filtered. Result: every live user whose
        current event_type is 'click', with the primary LWW lsn."""
        import pyarrow as pa
        from debezium_incubator_ray import schema as S
        from debezium_incubator_ray.pipelines import events_cdc as EC
        from debezium_incubator_ray.pipelines.derive import (
            derive_rekeyed_envelopes,
        )

        root = EC.scratch_dir("pfx")
        binlog, lake = os.path.join(root, "binlog"), os.path.join(root, "lake")
        env = EC.events_envelopes(sf_dir, delete_aware=True)
        idx_schema = pa.schema(
            [pa.field("event_type", pa.string()),
             pa.field("user_id", pa.int64(), nullable=False)]
        )
        derived = derive_rekeyed_envelopes(
            env, idx_schema, ("event_type", "user_id")
        )
        EC.write_env_binlog(derived, binlog, num_partitions=1)
        eng = EC.make_engine(
            lake, key_cols=("event_type", "user_id"), payload_schema=idx_schema
        )
        eng.run(binlog)
        out = eng.lookup_prefix(("click",))
        i = out.schema.get_field_index(S.LSN)
        return out.set_column(i, pa.field("lsn", pa.int64()), out[S.LSN])

    def cdc_fan_in(sf_dir):
        """Sharded fan-in: the event stream splits by user parity into two
        'upstream shards' with INDEPENDENT LSN domains (shard A's offsets
        shifted +10M), each draining into ONE lake table under its own
        offset channel (per-source watermarks + segments-done). Keys are
        disjoint by construction, so the final state equals plain LWW over
        the union."""
        import pyarrow as pa
        import pyarrow.compute as pc
        from debezium_incubator_ray.pipelines import events_cdc as EC

        root = EC.scratch_dir("fanin")
        lake = os.path.join(root, "lake")
        env = EC.events_envelopes(sf_dir, delete_aware=True)
        after_uid = env["after"].combine_chunks().field("user_id")
        before_uid = env["before"].combine_chunks().field("user_id")
        uid = pc.coalesce(after_uid, before_uid)
        odd = pc.equal(pc.bit_wise_and(pc.cast(uid, pa.int64()), 1), 1)

        def shift_lsn(e, delta):
            src = e["source"].combine_chunks()
            fields = [src.field(i) for i in range(src.type.num_fields)]
            names = [src.type.field(i).name for i in range(src.type.num_fields)]
            li = names.index("lsn")
            fields[li] = pc.add(fields[li], delta)
            new_src = pa.StructArray.from_arrays(
                fields, fields=[src.type.field(i) for i in range(src.type.num_fields)]
            )
            i = e.schema.get_field_index("source")
            e = e.set_column(i, e.schema.field(i), new_src)
            j = e.schema.get_field_index("ts_ms")
            return e.set_column(
                j, e.schema.field(j), pc.add(e["ts_ms"].combine_chunks(), delta)
            )

        env_a = shift_lsn(env.filter(pc.invert(odd)), 10_000_000)
        env_b = env.filter(odd)
        dir_a, dir_b = os.path.join(root, "a"), os.path.join(root, "b")
        EC.write_env_binlog(env_a, dir_a)
        EC.write_env_binlog(env_b, dir_b)
        eng = EC.make_engine(lake)
        eng.run_fan_in({"A": dir_a, "B": dir_b})
        return eng.lake_table().select(["user_id", "event_type", "value"])

    def cdc_materialized_view(sf_dir):
        """Persistently-maintained aggregate view: the change stream is
        applied in THREE epochs, each folding its deltas against the view
        lake's current state (pipelines/derive.py agg_view_envelopes) and
        upserting through a normal CdcEngine — the view survives restarts
        and replays exactly-once. Oracle: GROUP BY over the final LWW
        state."""
        import numpy as _np
        import pyarrow as pa
        import pyarrow.compute as pc
        from debezium_incubator_ray.config import EngineConfig
        from debezium_incubator_ray.pipelines import events_cdc as EC
        from debezium_incubator_ray.pipelines.cdc import CdcEngine
        from debezium_incubator_ray.pipelines.derive import agg_view_envelopes

        root = EC.scratch_dir("mview")
        lake = os.path.join(root, "lake")
        env = EC.events_envelopes(sf_dir, delete_aware=True)
        lsn = env["source"].combine_chunks().field("lsn").to_numpy(
            zero_copy_only=False
        )
        cuts = _np.quantile(lsn, [1 / 3, 2 / 3])
        view_schema = pa.schema([
            pa.field("event_type", pa.string()),
            pa.field("n", pa.int64()),
            pa.field("total", pa.float64()),
        ])
        eng = CdcEngine(
            lake,
            EngineConfig(table="agg_view", key="event_type",
                         num_partitions=4),
            payload_schema=view_schema,
        )
        masks = [lsn <= cuts[0], (lsn > cuts[0]) & (lsn <= cuts[1]),
                 lsn > cuts[1]]
        d = os.path.join(root, "binlog")  # ONE dir: segments_done tracks
        for i, m in enumerate(masks):     # paths relative to the binlog dir
            chunk = env.filter(pa.array(m))
            cur = eng.lake_table() if i else None
            envs = agg_view_envelopes(chunk, "event_type", "value",
                                      cur, lsn=i + 1)
            EC.write_env_binlog(envs, d, num_partitions=1, append=True)
            eng.run(d)
        out = eng.lake_table()
        i = out.schema.get_field_index("total")
        return out.set_column(i, "total", pc.round(out["total"], ndigits=3))

    def cdc_row_expiry(sf_dir):
        """Retention sweep: after the stream applies, expire live rows
        with value < 30 — zone maps drop provably-old runs unread and skip
        provably-fresh partitions entirely. Oracle: the LWW final state
        filtered by the same predicate."""
        import pyarrow as pa
        from debezium_incubator_ray import schema as S
        from debezium_incubator_ray.pipelines import events_cdc as EC

        root = EC.scratch_dir("expiry")
        binlog, lake = os.path.join(root, "binlog"), os.path.join(root, "lake")
        EC.write_events_binlog(sf_dir, binlog)
        eng = EC.make_engine(lake, stats_columns=("value",))
        eng.run(binlog)
        eng.expire_rows("value", 30.0)
        out = eng.lake_table(include_lsn=True)
        i = out.schema.get_field_index(S.LSN)
        return out.set_column(i, pa.field("lsn", pa.int64()), out[S.LSN])

    def cdc_zone_scan(sf_dir):
        """Zone-map range scan: the lake records per-run min/max for the
        configured stats columns; scan(col, lo, hi) prunes whole runs
        before opening them and exact-filters the rest. Oracle: the LWW
        final state filtered by the same range."""
        from debezium_incubator_ray.pipelines import events_cdc as EC

        root = EC.scratch_dir("zscan")
        binlog, lake = os.path.join(root, "binlog"), os.path.join(root, "lake")
        EC.write_events_binlog(sf_dir, binlog)
        eng = EC.make_engine(lake, stats_columns=("value", "ts"))
        eng.run(binlog)
        if not any(
            (f.get("stats") or {}).get("value")
            for p in range(EC.NUM_PARTITIONS)
            for f in eng.manifest.files(p)
        ):
            raise RuntimeError("no zone maps recorded")
        return eng.scan("value", lo=20.0, hi=60.0)

    def cdc_key_range_scan(sf_dir):
        """Key-range scan pruned by the sorted-run bounds themselves: every
        run records [min_key, max_key] (no zone-map config needed), so
        scan(key, lo, hi) opens only intersecting runs and exact-filters
        the rest. Oracle: LWW final state WHERE key BETWEEN."""
        from debezium_incubator_ray.pipelines import events_cdc as EC

        root = EC.scratch_dir("kscan")
        binlog, lake = os.path.join(root, "binlog"), os.path.join(root, "lake")
        EC.write_events_binlog(sf_dir, binlog)
        # small runs => many narrow disjoint key ranges per partition, so
        # the [100, 500] range provably skips whole runs
        eng = EC.make_engine(lake, target_rows_per_file=8)
        eng.run(binlog)
        out = eng.scan("user_id", lo=100, hi=500)
        assert eng._last_scan_stats["runs_read"] < eng._last_scan_stats["runs_total"], \
            eng._last_scan_stats  # the run bounds must actually prune
        return out

    def cdc_lake_join(sf_dir):
        """Co-partitioned lake-to-lake join: the event stream splits by LSN
        parity into two lakes sharing key/partitioner/partition-count, so
        the join is one task per partition with NO shuffle (join_lake).
        Oracle: SQL inner join of the two LWW final states."""
        import pyarrow.compute as pc
        from debezium_incubator_ray.pipelines import events_cdc as EC

        root = EC.scratch_dir("ljoin")
        env = EC.events_envelopes(sf_dir)
        lsn = env["source"].combine_chunks().field("lsn")
        even = pc.equal(pc.bit_wise_and(lsn, 1), 0)
        engines = []
        for tag, mask in (("a", even), ("b", pc.invert(even))):
            binlog = os.path.join(root, f"binlog-{tag}")
            lake = os.path.join(root, f"lake-{tag}")
            EC.write_env_binlog(env.filter(mask), binlog)
            eng = EC.make_engine(lake)
            eng.run(binlog)
            engines.append(eng)
        return engines[0].join_lake(engines[1], join_type="inner")

    def cdc_join_view(sf_dir):
        """Incrementally-MAINTAINED join view (pipelines/view.py): the
        parity-split lakes of cdc_lake_join, but side A is applied in
        TWO epochs with a JoinView refresh after each — the second
        refresh recomputes only the partitions epoch 2 touched (the
        partition-skip law is asserted in tests/test_join_view.py; here
        the converged view must equal the one-shot SQL join). Refresh
        cost is proportional to CHANGED partitions, never view size."""
        import numpy as _np
        import pyarrow as pa
        import pyarrow.compute as pc
        from debezium_incubator_ray.pipelines import events_cdc as EC

        root = EC.scratch_dir("jview")
        env = EC.events_envelopes(sf_dir)
        lsn = env["source"].combine_chunks().field("lsn")
        even = pc.equal(pc.bit_wise_and(lsn, 1), 0)
        la = env.filter(even)
        lb = env.filter(pc.invert(even))

        binlog_a = os.path.join(root, "binlog-a")
        binlog_b = os.path.join(root, "binlog-b")
        lsn_a = la["source"].combine_chunks().field("lsn").to_numpy(
            zero_copy_only=False
        )
        cut = int(_np.quantile(lsn_a, 0.5))
        EC.write_env_binlog(la.filter(pa.array(lsn_a <= cut)), binlog_a)
        eng_a = EC.make_engine(os.path.join(root, "lake-a"))
        eng_a.run(binlog_a)
        EC.write_env_binlog(lb, binlog_b)
        eng_b = EC.make_engine(os.path.join(root, "lake-b"))
        eng_b.run(binlog_b)

        view = eng_a.join_view(eng_b, os.path.join(root, "view"))
        view.refresh()
        # epoch 2: the rest of side A arrives as appended segments
        EC.write_env_binlog(la.filter(pa.array(lsn_a > cut)), binlog_a,
                            append=True)
        eng_a.run(binlog_a)
        view.refresh()
        return view.table()

    def cdc_snapshot_join(sf_dir):
        """Cross-lake POINT-IN-TIME join: both parity lakes keep
        streaming past a common logical cut, but the join is pinned to
        the manifest versions each lake committed AT the cut —
        `join_lake(left_version=, right_version=)` reads both sides
        through their retained manifests, so the answer is the
        consistent snapshot pair, not the drifting live states. Oracle:
        the lake-join SQL restricted to lsn <= cut on BOTH sides."""
        import pyarrow.compute as pc
        from debezium_incubator_ray.pipelines import events_cdc as EC

        root = EC.scratch_dir("snapjoin")
        env = EC.events_envelopes(sf_dir)
        lsn = env["source"].combine_chunks().field("lsn")
        cut = int(pc.max(lsn).as_py()) // 2
        even = pc.equal(pc.bit_wise_and(lsn, 1), 0)

        engines, vers = [], []
        for tag, mask in (("a", even), ("b", pc.invert(even))):
            binlog = os.path.join(root, f"binlog-{tag}")
            lake = os.path.join(root, f"lake-{tag}")
            side = env.filter(mask)
            slsn = side["source"].combine_chunks().field("lsn")
            EC.write_env_binlog(
                side.filter(pc.less_equal(slsn, cut)), binlog)
            eng = EC.make_engine(lake)
            eng.run(binlog)
            vers.append(eng.manifest.version)
            EC.write_env_binlog(
                side.filter(pc.greater(slsn, cut)), binlog, append=True)
            eng.run(binlog)  # the lakes move PAST the cut
            engines.append(eng)
        return engines[0].join_lake(
            engines[1], join_type="inner",
            left_version=vers[0], right_version=vers[1],
        )

    def cdc_enriched_view(sf_dir):
        """Stream-table JOIN VIEW: the events envelope stream is enriched
        with customer attributes (fk user_id -> dimension lake keyed
        c_custkey, LEFT join — missing dims yield NULLs) and the
        enriched stream feeds a normal CDC lake, so watermarks and
        exactly-once compose. Envelopes route by the DIMENSION's
        partitioner; each dim partition's state is read once per group
        and joined vectorized — never a per-event lookup. Oracle: LWW
        final state LEFT JOINed to customer in SQL."""
        import pyarrow as pa
        import pyarrow.compute as pc
        import ray.data
        from debezium_incubator_ray import schema as S
        from debezium_incubator_ray.pipelines import events_cdc as EC
        from debezium_incubator_ray.pipelines.derive import enrich_envelopes

        root = EC.scratch_dir("enrich")
        dim = EC.make_engine(
            os.path.join(root, "dim"),
            payload_schema=pa.schema([
                pa.field("c_custkey", pa.int64(), nullable=False),
                pa.field("c_name", pa.string()),
                pa.field("c_acctbal", pa.float64()),
            ]),
            table="customer", key="c_custkey",
        )
        dim.snapshot(ray.data.read_parquet(
            os.path.join(sf_dir, "customer.parquet"),
            columns=["c_custkey", "c_name", "c_acctbal"],
        ))
        env = EC.events_envelopes(sf_dir)
        enriched, out_schema = enrich_envelopes(
            env, dim, "user_id", ["c_name", "c_acctbal"],
            EC.EVENTS_PAYLOAD,
        )
        env_tb = pa.concat_tables(
            [b for b in enriched.iter_batches(batch_format="pyarrow")],
            promote_options="permissive",
        )
        # segments are LSN-ordered within each partition dir
        src = env_tb["source"].combine_chunks()
        env_tb = env_tb.take(pc.sort_indices(pa.table({
            "p": src.field("partition"), "l": src.field("lsn"),
        }), sort_keys=[("p", "ascending"), ("l", "ascending")]))
        binlog = os.path.join(root, "binlog")
        EC.write_env_binlog(env_tb, binlog)
        view = EC.make_engine(os.path.join(root, "view"),
                              payload_schema=out_schema)
        view.run(binlog)
        out = view.lake_table(include_lsn=True)
        i = out.schema.get_field_index(S.LSN)
        return out.set_column(i, pa.field("lsn", pa.int64()), out[S.LSN])

    def cdc_key_erasure(sf_dir):
        """Right-to-be-forgotten: after a full CDC replay, erase user_id <
        20 from the lake (state surgery — only runs whose key range
        intersects are rewritten) and expire history to the forget point.
        Oracle: the LWW final state minus the erased keys."""
        import pyarrow as pa
        from debezium_incubator_ray import schema as S
        from debezium_incubator_ray.pipelines import events_cdc as EC

        root = EC.scratch_dir("erase")
        binlog, lake = os.path.join(root, "binlog"), os.path.join(root, "lake")
        EC.write_events_binlog(sf_dir, binlog)
        eng = EC.make_engine(lake)
        eng.run(binlog)
        st = eng.erase_keys(list(range(20)), vacuum_history=True)
        if st["erased_rows"] == 0:
            raise RuntimeError("erasure removed nothing")
        if eng.lookup(list(range(20))).num_rows != 0:
            raise RuntimeError("erased keys still readable")
        out = eng.lake_table(include_lsn=True)
        i = out.schema.get_field_index(S.LSN)
        return out.set_column(i, pa.field("lsn", pa.int64()), out[S.LSN])

    def cdc_transactional(sf_dir):
        """Transaction-boundary apply: events carry (tx_id, tx_events) per
        partition-local transaction of 5; the LAST transaction in every
        partition is declared one event short (incomplete), so the engine
        must apply exactly the complete-transaction prefix and defer the
        rest — the oracle drops the same per-partition tail in SQL."""
        import pyarrow as pa
        from debezium_incubator_ray import schema as S
        from debezium_incubator_ray.pipelines import events_cdc as EC

        root = EC.scratch_dir("txn")
        binlog, lake = os.path.join(root, "binlog"), os.path.join(root, "lake")
        EC.write_env_binlog(EC.tx_tagged_envelopes(sf_dir), binlog)
        eng = EC.make_engine(lake)
        eng.cfg.transactional = True
        stats = eng.run(binlog)
        if not any(s["deferred"] > 0 for s in stats):
            raise RuntimeError("no segment deferred — tx gate never engaged")
        out = eng.lake_table(include_lsn=True)
        i = out.schema.get_field_index(S.LSN)
        return out.set_column(i, pa.field("lsn", pa.int64()), out[S.LSN])

    def cdc_pk_update(sf_dir):
        """PK-UPDATE (key-change) sequence — the reference's rekey law
        (OracleConnectorIT.java:~420-456): a primary-key change arrives
        as DELETE(old key) + CREATE(new key) inside ONE transaction.
        Every live LWW winner with user_id % 10 == 3 is rekeyed to
        user_id + 1_000_001 (shifting its mod-8 partition), so each
        rekey transaction SPANS two partitions; the engine's epoch-global
        transaction completeness applies both halves atomically in one
        manifest commit. Oracle: base LWW minus rekeyed old keys plus
        the new keys carrying the winner payloads at the c-event lsn."""
        from debezium_incubator_ray.pipelines import events_cdc as EC

        return EC.final_state_pk_update(sf_dir)

    def cdc_constraint_filter(sf_dir):
        """Row-level CHECK constraints enforced at normalize (Delta table
        constraints + dead-letter discipline): c/u/r events with
        value < 10 or a NULL event_type are dropped BEFORE apply, so the
        prior lake value survives exactly as if the event never arrived;
        deletes are exempt. Oracle: LWW over the same-filtered stream."""
        import pyarrow as pa
        from debezium_incubator_ray import schema as S
        from debezium_incubator_ray.pipelines import events_cdc as EC

        root = EC.scratch_dir("constr")
        binlog, lake = os.path.join(root, "binlog"), os.path.join(root, "lake")
        EC.write_events_binlog(sf_dir, binlog)
        eng = EC.make_engine(
            lake,
            constraints=(("value", "min", 10.0),
                         ("event_type", "not_null")),
        )
        eng.run(binlog)
        out = eng.lake_table(include_lsn=True)
        i = out.schema.get_field_index(S.LSN)
        return out.set_column(i, pa.field("lsn", pa.int64()), out[S.LSN])

    def cdc_dead_letters(sf_dir):
        """The dead-letter view: every c/u event the lake's CHECK
        constraints reject, with the first violated rule as reason —
        derived on demand from the binlog (no second copy of state).
        Oracle: the same filter + CASE in SQL."""
        import pyarrow as pa
        from debezium_incubator_ray import schema as S
        from debezium_incubator_ray.pipelines import events_cdc as EC

        root = EC.scratch_dir("dlq")
        binlog, lake = os.path.join(root, "binlog"), os.path.join(root, "lake")
        EC.write_events_binlog(sf_dir, binlog)
        eng = EC.make_engine(
            lake,
            constraints=(("value", "min", 10.0),
                         ("event_type", "not_null")),
        )
        out = eng.dead_letters(binlog)

        def shape(t: pa.Table) -> pa.Table:
            t = t.drop_columns([S.PART])
            i = t.schema.get_field_index(S.LSN)
            return t.set_column(i, pa.field("lsn", pa.int64()), t[S.LSN])

        return out.map_batches(shape, batch_format="pyarrow")

    def cdc_tx_summary(sf_dir):
        """The Debezium transaction-metadata topic analog: one row per
        source transaction from a pure metadata fold over the binlog
        (only the source struct + tx columns leave storage) — tx_id,
        event count, declared size, LSN span, completeness. The oracle
        re-derives the same transaction structure in SQL window
        functions."""
        from debezium_incubator_ray.pipelines import events_cdc as EC
        from debezium_incubator_ray.pipelines.cdc import transaction_summary

        root = EC.scratch_dir("txsum")
        binlog = os.path.join(root, "binlog")
        EC.write_env_binlog(EC.tx_tagged_envelopes(sf_dir), binlog)
        return transaction_summary(binlog)

    def cdc_composite_key(sf_dir):
        """Composite primary key (reference: key = ALL pk cells,
        RecordMaker.java:36-58): LWW state keyed on (user_id, event_type).
        Delete events extract every key component from the before image, so
        a delete removes exactly the (user, previous-event-type) row — the
        oracle expresses the same via lag() per user."""
        import pyarrow as pa
        from debezium_incubator_ray import schema as S
        from debezium_incubator_ray.pipelines import events_cdc as EC

        root = EC.scratch_dir("ck")
        binlog, lake = os.path.join(root, "binlog"), os.path.join(root, "lake")
        EC.write_events_binlog(sf_dir, binlog)
        eng = EC.make_engine(lake, key_cols=("user_id", "event_type"))
        eng.run(binlog)
        out = eng.lake_table(include_lsn=True)
        i = out.schema.get_field_index(S.LSN)
        return out.set_column(i, pa.field("lsn", pa.int64()), out[S.LSN])

    def cdc_incremental_agg(sf_dir):
        """Incremental view maintenance: maintain SUM(value)/COUNT per
        event_type by folding each change event's +after/-before delta —
        no lake rescan, no per-key state, no ordering requirement. Oracle:
        the same aggregate recomputed from the stream's LWW final state."""
        import ray.data

        from debezium_incubator_ray.functions.incremental import (
            incremental_groupby_agg,
        )
        from debezium_incubator_ray.pipelines.events_cdc import events_envelopes

        env = events_envelopes(sf_dir, delete_aware=True)
        ds = ray.data.from_arrow(env)
        return incremental_groupby_agg(ds, "event_type", "value")

    def cdc_incremental_distinct(sf_dir):
        """Incremental DISTINCT-count view maintenance: count(DISTINCT
        props) per event_type held up to date from the change stream's
        +after/-before deltas via per-(group, value) refcounts — the view
        sum/count maintenance can't express. Oracle: the same distinct
        count recomputed from the stream's LWW final state."""
        import ray.data
        from debezium_incubator_ray.functions.incremental import (
            incremental_distinct_count,
        )
        from debezium_incubator_ray.pipelines.events_cdc import (
            events_envelopes,
        )

        env = events_envelopes(sf_dir, delete_aware=True)
        ds = ray.data.from_arrow(env)
        return incremental_distinct_count(ds, "event_type", "props")

    def embedding_normalize(sf_dir):
        """L2 normalization of the embedding column (unit vectors make
        cosine = dot). Oracle: the identical list expression in SQL."""
        import ray.data

        from debezium_incubator_ray.functions.ann import normalize_embeddings

        ds = ray.data.read_parquet(os.path.join(sf_dir, "embeddings.parquet"))
        return ds.map_batches(
            lambda t: normalize_embeddings(t).select(["vec_id", "embedding_unit"]),
            batch_format="pyarrow",
            zero_copy_batch=True,
        )

    def windowed_hopping_agg(sf_dir):
        """Hopping (sliding) windows: 2-hour windows hopping hourly — every
        event lands in two windows, fanned out inside the partial aggregate
        (shuffle carries window×group sums, not event copies)."""
        import ray.data

        from debezium_incubator_ray.functions.windows import hopping_agg
        from debezium_incubator_ray.pipelines.events_cdc import load_events

        ds = ray.data.from_arrow(load_events(sf_dir))
        return hopping_agg(ds, hop_us=3_600_000_000, n_hops=2)

    def text_repetition(sf_dir):
        """Within-document repetition (Gopher-style gate): duplicate-2-gram
        fraction per document, fully vectorized (adjacent token-hash
        combine + lexsort distinct counts). Oracle: DuckDB list
        comprehension building the same 2-grams."""
        import ray.data

        from debezium_incubator_ray.functions.text import repetition_metrics

        ds = ray.data.read_parquet(
            os.path.join(sf_dir, "documents.parquet"),
            columns=["doc_id", "text"],
        )
        return ds.map_batches(
            repetition_metrics, batch_format="pyarrow", zero_copy_batch=True
        )

    def text_pii_redact(sf_dir):
        """PII scrubbing: deterministic emails/IPs/phone numbers are
        injected per document (the SAME expressions the oracle uses) and
        redact_pii must replace every occurrence with typed placeholders —
        identical RE2 passes run in DuckDB as the oracle."""
        import pyarrow as pa
        import pyarrow.compute as pc
        import ray.data

        from debezium_incubator_ray.functions.web import redact_pii

        def inject_and_redact(t: pa.Table) -> pa.Table:
            did = t["doc_id"].combine_chunks()
            s = pc.cast(did, pa.string())
            m7 = pc.cast(pc.subtract(did, pc.multiply(
                pc.divide(did, 7), pa.scalar(7, pa.int64()))), pa.string())
            m256 = pc.cast(pc.subtract(did, pc.multiply(
                pc.divide(did, 256), pa.scalar(256, pa.int64()))), pa.string())
            injected = pc.binary_join_element_wise(
                t["text"].combine_chunks(),
                pc.binary_join_element_wise(
                    pa.array(["contact user"] * t.num_rows), s,
                    pa.array(["@mail-"] * t.num_rows), m7,
                    pa.array([".com or +1 555 00"] * t.num_rows), s,
                    pa.array([" from 10.0."] * t.num_rows), m256,
                    pa.array([".5"] * t.num_rows), "",
                ),
                " ",
            )
            return pa.table(
                {"doc_id": did, "text_redacted": redact_pii(injected)}
            )

        ds = ray.data.read_parquet(
            os.path.join(sf_dir, "documents.parquet"),
            columns=["doc_id", "text"],
        )
        return ds.map_batches(
            inject_and_redact, batch_format="pyarrow", zero_copy_batch=True
        )

    def text_line_dedup(sf_dir):
        """CCNet-style boilerplate removal: deterministic footer/promo lines
        are injected per document (the SAME expressions the oracle uses),
        then line_dedup must strip exactly the lines occurring in >= 10
        docs, rebuilding each document from its surviving lines."""
        import pyarrow as pa
        import pyarrow.compute as pc
        import ray.data

        from debezium_incubator_ray.functions.text import line_dedup

        def inject(t: pa.Table) -> pa.Table:
            doc_id = t["doc_id"].combine_chunks()
            footer = pc.binary_join_element_wise(
                pa.array(["footer-"] * t.num_rows), t["source"].combine_chunks(), ""
            )
            promo = pc.binary_join_element_wise(
                pa.array(["promo-"] * t.num_rows),
                pc.cast(pc.subtract(doc_id, pc.multiply(
                    pc.divide(doc_id, 3), pa.scalar(3, pa.int64()))), pa.string()),
                "",
            )
            text2 = pc.binary_join_element_wise(
                t["text"].combine_chunks(), footer, promo, "\n"
            )
            return pa.table({"doc_id": doc_id, "text": text2})

        docs = ray.data.read_parquet(
            os.path.join(sf_dir, "documents.parquet"),
            columns=["doc_id", "text", "source"],
        ).map_batches(inject, batch_format="pyarrow", zero_copy_batch=True)
        out = line_dedup(docs, min_docs=10)
        return out.select_columns(["doc_id", "text_clean"])

    def _with_synth_urls(sf_dir):
        """documents + a deterministic messy-URL column derived from doc_id
        (the testdata has no url column; the SAME expression is embedded in
        the DuckDB oracle so both sides canonicalize identical inputs)."""
        import numpy as np
        import pyarrow as pa
        import ray.data

        def add_urls(t: pa.Table) -> pa.Table:
            ids = t["doc_id"].combine_chunks().to_numpy()
            scheme = np.array(["http://", "https://", "HTTPS://"])[ids % 3]
            www = np.where(ids % 2 == 0, "www.", "")
            sub = np.where(ids % 5 == 0, "news.", "")
            tail = np.array(
                ["?utm_source=feed&q=1", "?q=1&utm_campaign=x", "#sec2", "/"]
            )[ids % 4]
            host = np.char.add(
                np.char.add("Host", (ids % 23).astype(str)), ".COM/p/"
            )
            url = np.char.add(
                np.char.add(np.char.add(np.char.add(scheme, www), sub), host),
                np.char.add(ids.astype(str), tail),
            )
            return t.append_column("url", pa.array(url.tolist(), pa.string()))

        ds = ray.data.read_parquet(
            os.path.join(sf_dir, "documents.parquet"),
            columns=["doc_id", "n_chars"],
        )
        return ds.map_batches(add_urls, batch_format="pyarrow", zero_copy_batch=True)

    def url_canonicalize(sf_dir):
        """Vectorized URL canonicalization + registered-domain extraction
        (functions/web.py) over synthesized crawl-style URLs — fragment,
        scheme, host-case, www., utm_* params and trailing slashes all
        normalize; the DuckDB oracle applies the identical RE2 passes."""
        from debezium_incubator_ray.functions.web import UrlCanonicalizer

        return _with_synth_urls(sf_dir).map_batches(
            lambda t: UrlCanonicalizer()(t).select(
                ["doc_id", "url_canon", "domain"]
            ),
            batch_format="pyarrow",
            zero_copy_batch=True,
        )

    def url_domain_stats(sf_dir):
        """Per-registered-domain rollup (docs + chars) after
        canonicalization — the politeness/quota primitive of a crawl
        pipeline. Partial-aggregate shape: canonicalize inside map_batches,
        then a small groupby over ~23 domains."""
        from ray.data.aggregate import Count, Sum

        from debezium_incubator_ray.functions.web import UrlCanonicalizer

        ds = _with_synth_urls(sf_dir).map_batches(
            lambda t: UrlCanonicalizer()(t).select(["domain", "n_chars"]),
            batch_format="pyarrow",
            zero_copy_batch=True,
        )
        return ds.groupby("domain").aggregate(
            Count(alias_name="n_docs"), Sum("n_chars", alias_name="chars_total")
        )

    def text_token_count(sf_dir):
        import ray.data
        from debezium_incubator_ray.functions.text import token_count

        ds = ray.data.read_parquet(
            os.path.join(sf_dir, "documents.parquet"), columns=["doc_id", "text"]
        )
        return ds.map_batches(
            lambda t: token_count(t).select(["doc_id", "n_tokens"]),
            batch_format="pyarrow",
            zero_copy_batch=True,
        )

    def text_quality(sf_dir):
        import ray.data
        from debezium_incubator_ray.functions.text import quality_score

        ds = ray.data.read_parquet(
            os.path.join(sf_dir, "documents.parquet"), columns=["doc_id", "text"]
        )
        return ds.map_batches(
            lambda t: quality_score(t).select(
                ["doc_id", "n_chars", "n_tokens", "mean_token_len", "punct_ratio"]
            ),
            batch_format="pyarrow",
            zero_copy_batch=True,
        )

    def text_lang_id(sf_dir):
        import ray.data
        from debezium_incubator_ray.functions.text import LangId

        ds = ray.data.read_parquet(
            os.path.join(sf_dir, "documents.parquet"), columns=["doc_id", "text"]
        )
        return ds.map_batches(
            LangId, batch_format="pyarrow", concurrency=2, batch_size=512
        ).select_columns(["doc_id", "pred_lang"])

    def text_lang_confusion(sf_dir):
        """Full (labeled lang, predicted lang) confusion matrix of the
        stopword-argmax detector — the eval artifact behind
        language-filter decisions (mismatch RATE alone hides which
        languages bleed into which). Per-block pair counts fold in one
        tiny groupby; NULL predictions (no marker tokens) count as the
        'unknown' row, mirrored by the oracle."""
        import pyarrow as pa
        import pyarrow.compute as pc
        import ray.data
        from ray.data.aggregate import Sum
        from debezium_incubator_ray.functions.text import LangId

        ds = ray.data.read_parquet(
            os.path.join(sf_dir, "documents.parquet"),
            columns=["doc_id", "text", "lang"],
        )

        def partial(t: pa.Table) -> pa.Table:
            t = t.filter(pc.is_valid(t["lang"]))
            pred = pc.fill_null(t["pred_lang"], "unknown")
            g = pa.table({"lang": t["lang"], "pred_lang": pred}).group_by(
                ["lang", "pred_lang"]
            ).aggregate([([], "count_all")])
            return pa.table({
                "lang": g["lang"],
                "pred_lang": g["pred_lang"],
                "n": pc.cast(g["count_all"], pa.int64()),
            })

        folded = (
            ds.map_batches(LangId, batch_format="pyarrow",
                           concurrency=(1, 4))
            .map_batches(partial, batch_format="pyarrow",
                         zero_copy_batch=True)
            .groupby(["lang", "pred_lang"])
            .aggregate(Sum("n", alias_name="n"))
        )
        return folded.map_batches(
            lambda t: pa.table({
                "lang": t["lang"], "pred_lang": t["pred_lang"],
                "n": pc.cast(t["n"], pa.int64()),
            }),
            batch_format="pyarrow",
        )

    def text_lang_mismatch(sf_dir):
        """Metadata-vs-content audit: per STORED language tag, how often
        does the stopword-argmax language detector disagree? (the
        mislabeled-corpus gauge run before language-filtered training
        mixes). LangId streams in an actor pool; per-block (lang, n,
        n_mismatch) partials fold narrow."""
        import pyarrow as pa
        import pyarrow.compute as pc
        import ray.data
        from ray.data.aggregate import Sum
        from debezium_incubator_ray.functions.text import LangId

        ds = ray.data.read_parquet(
            os.path.join(sf_dir, "documents.parquet"),
            columns=["doc_id", "text", "lang"],
        )

        def partial(t: pa.Table) -> pa.Table:
            t = t.filter(pc.is_valid(t["lang"]))  # mirrors the oracle's
            mism = pc.cast(                        # lang IS NOT NULL
                pc.fill_null(pc.not_equal(t["pred_lang"], t["lang"]),
                             True),
                pa.int64(),
            )
            g = pa.table({
                "lang": t["lang"],
                "one": pa.array([1] * t.num_rows, pa.int64()),
                "mism": mism,
            }).group_by("lang").aggregate([("one", "sum"), ("mism", "sum")])
            return pa.table({
                "lang": g["lang"],
                "n": pc.cast(g["one_sum"], pa.int64()),
                "m": pc.cast(g["mism_sum"], pa.int64()),
            })

        folded = (
            ds.map_batches(LangId, batch_format="pyarrow",
                           concurrency=(1, 2), batch_size=512)
            .map_batches(partial, batch_format="pyarrow")
            .groupby("lang")
            .aggregate(Sum("n", alias_name="n"), Sum("m", alias_name="m"))
        )

        def finish(t: pa.Table) -> pa.Table:
            return pa.table({
                "lang": t["lang"],
                "n": t["n"],
                "n_mismatch": t["m"],
                "mismatch_rate": pc.round(pc.divide(
                    pc.cast(t["m"], pa.float64()),
                    pc.cast(t["n"], pa.float64()),
                ), 6),
            })

        return folded.map_batches(finish, batch_format="pyarrow")

    def text_fingerprint(sf_dir):
        """md5 fingerprint of whitespace-normalized text (the verification
        bridge; the vectorized 64-bit rolling-hash Fingerprint stays the
        scale path and is unit-tested separately)."""
        import ray.data
        from debezium_incubator_ray.functions.text import fingerprint_md5

        ds = ray.data.read_parquet(
            os.path.join(sf_dir, "documents.parquet"), columns=["doc_id", "text"]
        )
        return ds.map_batches(
            fingerprint_md5, batch_format="pyarrow", zero_copy_batch=True
        ).select_columns(["doc_id", "fingerprint_md5"])

    def text_tfidf_topterms(sf_dir):
        """Top-3 TF-IDF terms per document (tf * ln(N/df), ties by term
        asc): one (term, doc) shuffle for df, broadcast vocab, single
        scoring pass."""
        import ray.data
        from debezium_incubator_ray.functions.text import tfidf_top_terms

        docs = ray.data.read_parquet(
            os.path.join(sf_dir, "documents.parquet"), columns=["doc_id", "text"]
        )
        return tfidf_top_terms(docs, k=3)

    def sample_stratified(sf_dir):
        """Deterministic per-language subsample: row kept iff
        md5(doc_id) % 1e6 < rate[lang] * 1e6 — replayable by any engine,
        no RNG, resumable over any shard subset."""
        import ray.data
        from debezium_incubator_ray.functions.sample import stratified_sample

        docs = ray.data.read_parquet(
            os.path.join(sf_dir, "documents.parquet"),
            columns=["doc_id", "lang", "source", "n_chars"],
        )
        out = stratified_sample(
            docs, {"en": 0.8, "zh": 0.5, "es": 0.3}, default_rate=0.1
        )
        return out

    def docs_quality_filter(sf_dir):
        """Quality-gate composition: token floor + mean-token-length and
        punctuation ceilings + language allowlist, metrics emitted with
        the kept rows."""
        import ray.data
        from debezium_incubator_ray.functions.sample import quality_filter

        docs = ray.data.read_parquet(
            os.path.join(sf_dir, "documents.parquet"),
            columns=["doc_id", "text", "lang"],
        )
        out = quality_filter(
            docs,
            min_tokens=20,
            max_mean_token_len=12.0,
            max_punct_ratio=0.1,
            langs=("en", "de", "fr", "es"),
        )
        return out.select_columns(
            ["doc_id", "lang", "n_tokens", "n_chars", "mean_token_len",
             "punct_ratio"]
        )

    def seq_packing(sf_dir):
        """Pack documents into 2048-token training sequences: each doc's
        (seq_id, seq_offset) from the exclusive prefix sum of token counts
        in doc_id order — distributed as a two-level scan (tiny per-range
        sums to the driver, broadcast starts, per-range local cumsum)."""
        import ray.data
        from debezium_incubator_ray.functions.pack import pack_sequences

        docs = ray.data.read_parquet(
            os.path.join(sf_dir, "documents.parquet"), columns=["doc_id", "text"]
        )
        return pack_sequences(docs, seq_len=2048)

    def sample_language_mix(sf_dir):
        """Exact mixture construction: per-language caps {en:120, zh:60,
        es:40, else 10} picked deterministically by (md5(doc_id), doc_id)
        within each language — the dict form of the quota sampler."""
        import ray.data
        from debezium_incubator_ray.functions.sample import domain_quota_sample

        docs = ray.data.read_parquet(
            os.path.join(sf_dir, "documents.parquet"),
            columns=["doc_id", "lang"],
        )
        out = domain_quota_sample(
            docs, {"en": 120, "zh": 60, "es": 40}, domain_col="lang",
            default_quota=10,
        )
        return out.select_columns(["doc_id", "lang"])

    def approx_distinct_users(sf_dir):
        """KMV distinct-count sketch over events.user_id (k=128): the
        k-min hash set is a pure function of the value set, so the
        distributed estimate is bit-identical to the oracle's."""
        import ray.data
        from debezium_incubator_ray.functions.sketch import approx_distinct_kmv

        ev = ray.data.read_parquet(
            os.path.join(sf_dir, "events.parquet"), columns=["user_id"]
        )
        return approx_distinct_kmv(ev, "user_id", k=128)

    def multimodal_frames(sf_dir):
        """Frame-sampling plumbing: k=4 evenly-spaced 16-byte 'frames' per
        binary payload, exploded one row per frame (the per-frame-model
        feed layout). Extraction is the deterministic byte-slice stand-in
        (real codecs plug decode_video_frames); frames compared as hex."""
        import pyarrow as pa
        import ray.data
        from debezium_incubator_ray.functions.multimodal import (
            FrameSampler, _hex_encode,
        )

        docs = ray.data.read_parquet(
            os.path.join(sf_dir, "documents.parquet"), columns=["doc_id", "text"]
        )

        def to_payload(t):
            import pyarrow.compute as _pc

            return pa.table({
                "doc_id": t["doc_id"],
                "payload": _pc.cast(t["text"], pa.large_binary()),
            })

        frames = docs.map_batches(
            to_payload, batch_format="pyarrow", zero_copy_batch=True
        ).map_batches(
            FrameSampler,
            fn_constructor_kwargs={"k": 4, "frame_bytes": 16},
            batch_format="pyarrow",
            zero_copy_batch=True,
            batch_size=256,
            concurrency=2,
        )

        def hexify(t):
            return pa.table({
                "doc_id": t["doc_id"],
                "frame_idx": t["frame_idx"],
                "frame_hex": _hex_encode(t["frame"].combine_chunks()),
            })

        return frames.map_batches(
            hexify, batch_format="pyarrow", zero_copy_batch=True
        )

    def dq_fk_orphans(sf_dir):
        """Referential data-quality check: distinct events.user_id values
        with no matching customer row — dimension keys broadcast once,
        fact batches reduce to distinct unmatched keys. The dimension is
        restricted to c_custkey % 10 != 0 so the check actually finds
        orphans (simulated missing dimension rows)."""
        import pyarrow as pa
        import pyarrow.parquet as pq
        import ray.data
        from debezium_incubator_ray.functions.quality import fk_orphans

        ev = ray.data.read_parquet(
            os.path.join(sf_dir, "events.parquet"), columns=["user_id"]
        )
        keys = pq.read_table(
            os.path.join(sf_dir, "customer.parquet"), columns=["c_custkey"]
        )["c_custkey"].combine_chunks()
        import numpy as _np

        kn = _np.asarray(keys.to_numpy(zero_copy_only=False))
        dim = pa.array(kn[kn % 10 != 0], pa.int64())
        return fk_orphans(ev, "user_id", dim)

    def dq_profile(sf_dir):
        """Column profile (rows, nulls, min, max per column) — one
        streaming pass of tiny per-block partials."""
        import ray.data
        from debezium_incubator_ray.functions.quality import profile_table

        docs = ray.data.read_parquet(
            os.path.join(sf_dir, "documents.parquet"),
            columns=["doc_id", "lang", "source", "n_chars"],
        )
        return profile_table(docs, ["doc_id", "lang", "source", "n_chars"])

    def source_jsonl(sf_dir):
        """JSONL source format: the documents table round-trips through
        newline-delimited JSON shards (the web-crawl interchange format)
        and the pipeline computes over the JSONL read — multi-format
        ingestion on the same operator surface. Oracle: the parquet
        route."""
        import pyarrow.parquet as pq
        import ray.data
        from debezium_incubator_ray.functions.text import token_count
        from debezium_incubator_ray.pipelines import events_cdc as EC

        root = EC.scratch_dir("jsonl_src")
        tbl = pq.read_table(
            os.path.join(sf_dir, "documents.parquet"),
            columns=["doc_id", "text"],
        )
        import json as _json

        n_shards = 4
        step = max(1, (tbl.num_rows + n_shards - 1) // n_shards)
        for k, lo in enumerate(range(0, tbl.num_rows, step)):
            sl = tbl.slice(lo, step).to_pylist()
            with open(os.path.join(root, f"shard-{k:02d}.jsonl"), "w") as f:
                for row in sl:
                    f.write(_json.dumps(row) + "\n")
        ds = ray.data.read_json(
            [os.path.join(root, n) for n in sorted(os.listdir(root))]
        )
        return ds.map_batches(
            lambda t: token_count(t).select(["doc_id", "n_tokens"]),
            batch_format="pyarrow",
            zero_copy_batch=True,
        )

    def source_csv(sf_dir):
        """CSV source format: same pipeline over quoted-CSV shards (Arrow
        CSV writer/reader round-trip — embedded commas/quotes/newlines in
        text survive). Oracle: the parquet route."""
        import pyarrow.csv as pacsv
        import pyarrow.parquet as pq
        import ray.data
        from debezium_incubator_ray.functions.text import token_count
        from debezium_incubator_ray.pipelines import events_cdc as EC

        root = EC.scratch_dir("csv_src")
        tbl = pq.read_table(
            os.path.join(sf_dir, "documents.parquet"),
            columns=["doc_id", "text"],
        )
        n_shards = 4
        step = max(1, (tbl.num_rows + n_shards - 1) // n_shards)
        paths = []
        for k, lo in enumerate(range(0, tbl.num_rows, step)):
            p = os.path.join(root, f"shard-{k:02d}.csv")
            pacsv.write_csv(tbl.slice(lo, step), p)
            paths.append(p)
        ds = ray.data.read_csv(
            paths,
            parse_options=pacsv.ParseOptions(newlines_in_values=True),
        )
        return ds.map_batches(
            lambda t: token_count(t).select(["doc_id", "n_tokens"]),
            batch_format="pyarrow",
            zero_copy_batch=True,
        )

    def corpus_token_stats(sf_dir):
        """One-row corpus report: doc count, total tokens and exact global
        token-count quantiles (p50/p90/p99 by the min-cum >= ceil(q*n)
        rule) from ONE streaming histogram."""
        import numpy as _np
        import pyarrow as pa
        import ray.data
        from debezium_incubator_ray.functions.sample import (
            global_histogram, quantile_from_cdf,
        )
        from debezium_incubator_ray.functions.text import token_count

        docs = ray.data.read_parquet(
            os.path.join(sf_dir, "documents.parquet"), columns=["doc_id", "text"]
        )
        counts = docs.map_batches(
            lambda t: token_count(t).select(["n_tokens"]),
            batch_format="pyarrow",
            zero_copy_batch=True,
        )
        vals, cum = global_histogram(counts, "n_tokens")
        n = int(cum[-1]) if len(cum) else 0
        per_val = _np.diff(cum, prepend=0)
        total = int((vals * per_val).sum()) if n else 0
        return pa.table({
            "n_docs": pa.array([n], pa.int64()),
            "total_tokens": pa.array([total], pa.int64()),
            "p50": pa.array([quantile_from_cdf(vals, cum, 0.5)], pa.int64()),
            "p90": pa.array([quantile_from_cdf(vals, cum, 0.9)], pa.int64()),
            "p99": pa.array([quantile_from_cdf(vals, cum, 0.99)], pa.int64()),
        })

    def text_normalize(sf_dir):
        """Pre-dedup text normalization: control chars -> space, whitespace
        collapse, trim — two RE2 sweeps over the column; the oracle applies
        the identical passes."""
        import ray.data
        from debezium_incubator_ray.functions.text import text_normalize_batch

        docs = ray.data.read_parquet(
            os.path.join(sf_dir, "documents.parquet"), columns=["doc_id", "text"]
        )
        return docs.map_batches(
            lambda t: text_normalize_batch(t).select(
                ["doc_id", "text_norm", "n_chars_norm"]
            ),
            batch_format="pyarrow",
            zero_copy_batch=True,
        )

    def join_broadcast_enrich(sf_dir):
        """Star-schema enrichment: the customer dimension broadcast once
        (ray.put), every orders batch hash-joins in place, then the
        partial-agg → tiny-groupby rollup by market segment. Nothing
        fact-sized shuffles."""
        import pyarrow as pa
        import pyarrow.compute as pc
        import pyarrow.parquet as pq
        import ray.data
        from ray.data.aggregate import Sum
        from debezium_incubator_ray.functions.joins import broadcast_join

        orders = ray.data.read_parquet(
            os.path.join(sf_dir, "orders.parquet"),
            columns=["o_custkey", "o_totalprice"],
        )
        dim = pq.read_table(
            os.path.join(sf_dir, "customer.parquet"),
            columns=["c_custkey", "c_mktsegment"],
        )
        joined = broadcast_join(orders, dim, on="o_custkey",
                                right_on="c_custkey")

        def partial(t: pa.Table) -> pa.Table:
            g = t.group_by("c_mktsegment").aggregate(
                [("o_totalprice", "sum"), ("o_totalprice", "count")]
            )
            return pa.table({
                "c_mktsegment": g["c_mktsegment"],
                "psum": g["o_totalprice_sum"],
                "pn": pc.cast(g["o_totalprice_count"], pa.int64()),
            })

        out = joined.map_batches(
            partial, batch_format="pyarrow", zero_copy_batch=True
        ).groupby("c_mktsegment").aggregate(
            Sum("psum", alias_name="revenue"), Sum("pn", alias_name="n_orders")
        )

        def stabilize(t: pa.Table) -> pa.Table:
            i = t.schema.get_field_index("revenue")
            return t.set_column(i, "revenue", pc.round(t["revenue"], ndigits=2))

        return out.map_batches(stabilize, batch_format="pyarrow")

    def join_shuffle_revenue(sf_dir):
        """Partitioned hash join of two LARGE sides (orders x lineitem on
        orderkey — neither broadcastable at scale): both route to the same
        key-hash bucket, each bucket joins with Arrow's kernel, then the
        partial-agg rollup of revenue per order priority."""
        import pyarrow as pa
        import pyarrow.compute as pc
        import ray.data
        from ray.data.aggregate import Sum
        from debezium_incubator_ray.functions.joins import shuffle_join

        orders = ray.data.read_parquet(
            os.path.join(sf_dir, "orders.parquet"),
            columns=["o_orderkey", "o_orderpriority"],
        )
        li = ray.data.read_parquet(
            os.path.join(sf_dir, "lineitem.parquet"),
            columns=["l_orderkey", "l_extendedprice", "l_discount"],
        )
        joined = shuffle_join(orders, li, on="o_orderkey", right_on="l_orderkey")

        def partial(t: pa.Table) -> pa.Table:
            rev = pc.multiply(
                t["l_extendedprice"],
                pc.subtract(pa.scalar(1.0), t["l_discount"]),
            )
            t2 = pa.table({"o_orderpriority": t["o_orderpriority"], "rev": rev})
            g = t2.group_by("o_orderpriority").aggregate(
                [("rev", "sum"), ("rev", "count")]
            )
            return pa.table({
                "o_orderpriority": g["o_orderpriority"],
                "psum": g["rev_sum"],
                "pn": pc.cast(g["rev_count"], pa.int64()),
            })

        out = joined.map_batches(
            partial, batch_format="pyarrow", zero_copy_batch=True
        ).groupby("o_orderpriority").aggregate(
            Sum("psum", alias_name="revenue"), Sum("pn", alias_name="n_items")
        )

        def stabilize(t: pa.Table) -> pa.Table:
            i = t.schema.get_field_index("revenue")
            return t.set_column(i, "revenue", pc.round(t["revenue"], ndigits=2))

        return out.map_batches(stabilize, batch_format="pyarrow")

    def join_salted_revenue(sf_dir):
        """join_shuffle_revenue with HOT-KEY SALTING forced (salt=4):
        each order key's probe rows spread across 4 sub-buckets and the
        lineitem side replicates into them — the skew-splitting mode a
        key holding a large share of the fact table needs at 100 TB.
        The joined result SET is salt-invariant by construction; the
        identical oracle pins that law at the driver gate."""
        import pyarrow as pa
        import pyarrow.compute as pc
        import ray.data
        from ray.data.aggregate import Sum
        from debezium_incubator_ray.functions.joins import shuffle_join

        orders = ray.data.read_parquet(
            os.path.join(sf_dir, "orders.parquet"),
            columns=["o_orderkey", "o_orderpriority"],
        )
        li = ray.data.read_parquet(
            os.path.join(sf_dir, "lineitem.parquet"),
            columns=["l_orderkey", "l_extendedprice", "l_discount"],
        )
        # the FACT table is the LEFT side: salt spreads LEFT rows
        # across sub-buckets and replicates the RIGHT (dimension-like
        # orders) side — a hot orderkey's many lineitem rows then
        # parallelize 4-ways instead of replicating the fact table
        joined = shuffle_join(li, orders, on="l_orderkey",
                              right_on="o_orderkey", salt=4)

        def partial(t: pa.Table) -> pa.Table:
            rev = pc.multiply(
                t["l_extendedprice"],
                pc.subtract(pa.scalar(1.0), t["l_discount"]),
            )
            t2 = pa.table({"o_orderpriority": t["o_orderpriority"], "rev": rev})
            g = t2.group_by("o_orderpriority").aggregate(
                [("rev", "sum"), ("rev", "count")]
            )
            return pa.table({
                "o_orderpriority": g["o_orderpriority"],
                "psum": g["rev_sum"],
                "pn": pc.cast(g["rev_count"], pa.int64()),
            })

        out = joined.map_batches(
            partial, batch_format="pyarrow", zero_copy_batch=True
        ).groupby("o_orderpriority").aggregate(
            Sum("psum", alias_name="revenue"), Sum("pn", alias_name="n_items")
        )

        def stabilize(t: pa.Table) -> pa.Table:
            i = t.schema.get_field_index("revenue")
            return t.set_column(i, "revenue", pc.round(t["revenue"], ndigits=2))

        return out.map_batches(stabilize, batch_format="pyarrow")

    def events_funnel(sf_dir):
        """Two-step funnel: users with a purchase strictly after their
        first click — the predicate decomposes into min/max partials, so
        only (user, min, max) rows shuffle."""
        import ray.data
        from debezium_incubator_ray.functions.windows import funnel_users

        ev = ray.data.read_parquet(
            os.path.join(sf_dir, "events.parquet"),
            columns=["user_id", "event_type", "event_id"],
        )
        return funnel_users(ev, "click", "purchase")

    def cdc_scd2_history(sf_dir):
        """SCD2 version table from the change stream: every non-delete
        event opens a validity interval [valid_from, valid_to) closed by
        the key's next event (any op); the open version is is_current.
        One hash-bucketed groupby on the key, vectorized interval kernel."""
        import ray.data
        from debezium_incubator_ray.functions.scd import scd2_history

        ev = ray.data.read_parquet(
            os.path.join(sf_dir, "events.parquet"),
            columns=["event_id", "user_id", "value"],
        )

        def to_changelog(t):
            import numpy as _np
            import pyarrow as _pa
            eid = t["event_id"].combine_chunks().to_numpy()
            mod = eid % 10
            op = _np.where(mod == 0, "d", _np.where(mod <= 2, "c", "u"))
            return _pa.table({
                "user_id": t["user_id"],
                "lsn": t["event_id"],
                "op": _pa.array(op, type=_pa.string()),
                "value": t["value"],
            })

        ch = ev.map_batches(to_changelog, batch_format="pyarrow",
                            zero_copy_batch=True)
        return scd2_history(ch, key_col="user_id", lsn_col="lsn",
                            op_col="op", value_cols=("value",))

    def events_running_total(sf_dir):
        """Per-user running cumulative sum ordered by event_id — the
        PARTITION BY ... ROWS UNBOUNDED PRECEDING window function as a
        bucketed groupby + segmented cumsum."""
        import ray.data
        from debezium_incubator_ray.functions.windows import running_total

        ev = ray.data.read_parquet(
            os.path.join(sf_dir, "events.parquet"),
            columns=["user_id", "event_id", "value"],
        )
        return running_total(ev)

    def events_anomaly(sf_dir):
        """Per-type z-score outliers (|z| > 3, population stddev) via
        decomposable moments: only #groups partial rows shuffle, then a
        broadcast second streaming pass flags rows."""
        import ray.data
        from debezium_incubator_ray.functions.windows import zscore_outliers

        ev = ray.data.read_parquet(
            os.path.join(sf_dir, "events.parquet"),
            columns=["event_id", "event_type", "value"],
        )
        return zscore_outliers(ev, threshold=3.0)

    def text_unigram_logprob(sf_dir):
        """Corpus-learned unigram LM score per doc: term-count model from
        one small groupby, broadcast, then a streaming scoring pass."""
        import ray.data
        from debezium_incubator_ray.functions.text import unigram_logprob

        docs = ray.data.read_parquet(
            os.path.join(sf_dir, "documents.parquet"),
            columns=["doc_id", "text"],
        )
        return unigram_logprob(docs)

    def text_bigram_logprob(sf_dir):
        """Corpus-learned BIGRAM LM score per doc (mean adjacent-pair
        conditional logprob, add-0.5 smoothing over the corpus
        vocabulary) — the fluency rung above unigram scoring: word salad
        with common words scores high on unigrams but low here. Bigram
        model folds through one narrow groupby, broadcasts once, scores
        streaming; bigrams never cross doc boundaries."""
        import ray.data
        from debezium_incubator_ray.functions.text import bigram_logprob

        docs = ray.data.read_parquet(
            os.path.join(sf_dir, "documents.parquet"),
            columns=["doc_id", "text"],
        )
        return bigram_logprob(docs)

    def events_props_extract(sf_dir):
        """Typed field extraction from the JSON props payload WITHOUT a
        row-loop JSON parser: one vectorized regex pulls $.k per event,
        then a per-type (n, mean, min, max) power fold — the clickstream
        'pull one property out of the payload' stage."""
        import ray.data
        from debezium_incubator_ray.functions.text import json_field_stats

        ev = ray.data.read_parquet(
            os.path.join(sf_dir, "events.parquet"),
            columns=["event_type", "props"],
        )
        return json_field_stats(ev, "props", "k", "event_type")

    def docs_ccnet_buckets(sf_dir):
        """CCNet-style head/middle/tail partitioning by language-model
        score: per-token mean unigram logprob per doc (length-invariant),
        global tertile thresholds WITHOUT a sort (bucket-histogram order
        statistics), then a streaming label pass. Head = most-fluent
        third."""
        import pyarrow as pa
        import ray.data
        from debezium_incubator_ray.functions.text import unigram_logprob
        from debezium_incubator_ray.functions.rank import (
            global_quantile_cont,
        )

        docs = ray.data.read_parquet(
            os.path.join(sf_dir, "documents.parquet"),
            columns=["doc_id", "text"],
        )
        scores = unigram_logprob(docs, per_token=True).materialize()
        qt = global_quantile_cont(scores, "logprob", [1 / 3, 2 / 3])
        t1, t2 = qt["value"].to_pylist()

        def label(t: pa.Table) -> pa.Table:
            import numpy as np

            lp = t["logprob"].combine_chunks().to_numpy(
                zero_copy_only=False
            )
            lab = np.where(lp <= t1, "tail",
                           np.where(lp <= t2, "middle", "head"))
            return pa.table({
                "doc_id": t["doc_id"],
                "logprob": t["logprob"],
                "bucket": pa.array(lab),
            })

        return scores.map_batches(label, batch_format="pyarrow")

    def text_inverted_index(sf_dir):
        """Inverted-index postings (term, doc_id, tf) for terms with
        df >= 10: df shuffle bucketed by term hash, vocabulary broadcast,
        posting emission is shuffle-free."""
        import ray.data
        from debezium_incubator_ray.functions.text import term_postings

        docs = ray.data.read_parquet(
            os.path.join(sf_dir, "documents.parquet"),
            columns=["doc_id", "text"],
        )
        return term_postings(docs, min_df=10)

    def docs_chunking(sf_dir):
        """Overlapping token-window chunking (32-token windows, 8-token
        overlap): one vectorized gather per batch, shuffle-free."""
        import ray.data
        from debezium_incubator_ray.functions.pack import chunk_token_windows

        docs = ray.data.read_parquet(
            os.path.join(sf_dir, "documents.parquet"),
            columns=["doc_id", "text"],
        )
        return chunk_token_windows(docs, chunk=32, overlap=8)

    def sample_split_assign(sf_dir):
        """Deterministic 90/5/5 train/val/test labels from the md5 bridge
        hash — identical split from any engine or shard subset."""
        import ray.data
        from debezium_incubator_ray.functions.sample import split_assign

        docs = ray.data.read_parquet(
            os.path.join(sf_dir, "documents.parquet"),
            columns=["doc_id", "lang"],
        )
        return split_assign(docs)

    def distinct_users_per_type(sf_dir):
        """Exact count-distinct per group with the combiner shape: batches
        reduce to distinct (type, user) pairs before the one narrow
        shuffle."""
        import ray.data
        from debezium_incubator_ray.functions.joins import distinct_count_per_group

        ev = ray.data.read_parquet(
            os.path.join(sf_dir, "events.parquet"),
            columns=["event_type", "user_id"],
        )
        return distinct_count_per_group(ev, "event_type", "user_id")

    def sample_fixed_k(sf_dir):
        """Exactly-100 uniform deterministic sample: the 100 docs with the
        smallest (md5(doc_id), doc_id) — per-block top-k partials merge on
        the driver, winner ids broadcast back."""
        import ray.data
        from debezium_incubator_ray.functions.sample import fixed_size_sample

        docs = ray.data.read_parquet(
            os.path.join(sf_dir, "documents.parquet"),
            columns=["doc_id", "n_chars"],
        )
        return fixed_size_sample(docs, k=100)

    def sample_domain_quota(sf_dir):
        """Crawl balancing: at most 10 docs per registered domain, chosen
        by (md5(doc_id), doc_id) within the domain — the election shuffles
        (domain, hash, id) only."""
        from debezium_incubator_ray.functions.sample import domain_quota_sample
        from debezium_incubator_ray.functions.web import UrlCanonicalizer

        docs = _with_synth_urls(sf_dir).map_batches(
            lambda t: UrlCanonicalizer()(t).select(
                ["doc_id", "n_chars", "domain"]
            ),
            batch_format="pyarrow",
            zero_copy_batch=True,
        )
        return domain_quota_sample(docs, quota=10).select_columns(
            ["doc_id", "domain"]
        )

    def url_best_dedup(sf_dir):
        """Crawl URL-dedup: synthesized URLs collide on path doc_id % 50
        (plus scheme/www/utm variants), canonicalize, and each canonical
        URL keeps its best capture (max n_chars, ties to min doc_id).
        Only (url_hash, score, id) shuffles."""
        import numpy as _np
        import pyarrow as _pa
        import ray.data
        from debezium_incubator_ray.functions.web import dedup_url_best

        def add_urls(t):
            ids = t["doc_id"].combine_chunks().to_numpy()
            scheme = _np.array(["http://", "https://", "HTTPS://"])[ids % 3]
            www = _np.where(ids % 2 == 0, "www.", "")
            sub = _np.where(ids % 5 == 0, "news.", "")
            tail = _np.array(  # every variant canonicalizes away entirely
                ["?utm_source=feed", "?utm_campaign=x", "#sec2", "/"]
            )[ids % 4]
            host = _np.char.add(
                _np.char.add("Host", (ids % 7).astype(str)), ".COM/p/"
            )
            url = _np.char.add(
                _np.char.add(_np.char.add(_np.char.add(scheme, www), sub), host),
                _np.char.add((ids % 50).astype(str), tail),
            )
            return t.append_column("url", _pa.array(url.tolist(), _pa.string()))

        docs = ray.data.read_parquet(
            os.path.join(sf_dir, "documents.parquet"),
            columns=["doc_id", "n_chars"],
        ).map_batches(add_urls, batch_format="pyarrow", zero_copy_batch=True)
        return dedup_url_best(docs).select_columns(["doc_id", "n_chars"])

    def docs_top_quantile(sf_dir):
        """Corpus-wide curation bar: keep docs at or above the exact global
        0.8-quantile of n_chars — threshold from a streaming histogram
        (distinct-value CDF on the driver), then a stateless filter."""
        import ray.data
        from debezium_incubator_ray.functions.sample import top_quantile_filter

        docs = ray.data.read_parquet(
            os.path.join(sf_dir, "documents.parquet"),
            columns=["doc_id", "n_chars"],
        )
        out, _thr = top_quantile_filter(docs, col="n_chars", q=0.8)
        return out

    def dedup_incremental(sf_dir):
        """Incremental-crawl dedup: the 'new shard' (doc_id % 3 == 0) is
        anti-joined by 128-bit content hash against the 'already ingested'
        corpus (doc_id % 2 == 0) — only novel content survives; both sides
        shuffle hashes + ids, never text."""
        import numpy as _np
        import pyarrow as _pa
        import ray.data
        from debezium_incubator_ray.functions.dedup import incremental_dedup

        docs = ray.data.read_parquet(
            os.path.join(sf_dir, "documents.parquet"),
            columns=["doc_id", "text", "n_chars"],
        )

        def split(mod, rem):
            def f(t):
                ids = _np.asarray(t["doc_id"].to_numpy(zero_copy_only=False))
                return t.filter(_pa.array(ids % mod == rem))

            return f

        new = docs.map_batches(split(3, 0), batch_format="pyarrow",
                               zero_copy_batch=True)
        old = docs.map_batches(split(2, 0), batch_format="pyarrow",
                               zero_copy_batch=True)
        return incremental_dedup(new, old).select_columns(
            ["doc_id", "n_chars"]
        )

    def text_decontaminate(sf_dir):
        """Benchmark decontamination: every corpus doc scored for distinct
        8-gram overlap with a small 'benchmark' subset (doc_id % 97 == 0 —
        stands in for an eval set). Benchmark gram hashes broadcast once;
        the corpus streams."""
        import numpy as _np
        import ray.data
        from debezium_incubator_ray.functions.contamination import decontaminate

        docs = ray.data.read_parquet(
            os.path.join(sf_dir, "documents.parquet"), columns=["doc_id", "text"]
        )

        def _bench_rows(t):
            import pyarrow as _pa

            ids = _np.asarray(t["doc_id"].to_numpy(zero_copy_only=False))
            return t.filter(_pa.array(ids % 97 == 0))

        bench = docs.map_batches(
            _bench_rows, batch_format="pyarrow", zero_copy_batch=True
        )
        return decontaminate(docs, bench, k=8)

    def ann_brute_topk(sf_dir):
        import numpy as np
        import pyarrow.parquet as pq
        import ray.data
        from debezium_incubator_ray.functions.ann import brute_force_topk, _batch_matrix

        qt = pq.read_table(os.path.join(sf_dir, "embeddings.parquet"))
        qt = qt.filter(__import__("pyarrow").compute.less(qt["vec_id"], 10))
        Q = _batch_matrix(qt)
        ds = ray.data.read_parquet(os.path.join(sf_dir, "embeddings.parquet"))
        out = brute_force_topk(ds, qt["vec_id"].to_numpy(), Q, k=5)
        return out.select(["query_id", "vec_id", "rank"])

    def ann_lsh_topk(sf_dir):
        """Bucketed ANN with axis-aligned hyperplanes (bit j = sign of
        coordinate j, a valid LSH family): each query searches only its
        bucket. SQL-reproducible buckets make the oracle exact — recall vs
        brute force is the documented LSH tradeoff, identical both sides."""
        import pyarrow.compute as pc
        import pyarrow.parquet as pq
        import ray.data
        from debezium_incubator_ray.functions.ann import lsh_topk, _batch_matrix

        qt = pq.read_table(os.path.join(sf_dir, "embeddings.parquet"))
        qt = qt.filter(pc.less(qt["vec_id"], 10))
        Q = _batch_matrix(qt)
        ds = ray.data.read_parquet(os.path.join(sf_dir, "embeddings.parquet"))
        out = lsh_topk(
            ds, qt["vec_id"].to_numpy(), Q, dim=Q.shape[1], k=5, n_planes=4,
            axis_aligned=True,
        )
        return out.select(["query_id", "vec_id", "rank"])

    def ann_recall_eval(sf_dir):
        """Retrieval-quality monitoring: recall@5 of the LSH index
        against exact brute force, per query and overall — the eval
        operator a production ANN deployment runs continuously. Both
        retrievals are the engine's own distributed paths; the join +
        recall fold is metadata-sized (k rows per query)."""
        import numpy as np
        import pandas as pd
        import pyarrow as pa
        import pyarrow.compute as pc
        import pyarrow.parquet as pq
        import ray.data
        from debezium_incubator_ray.functions.ann import (
            _batch_matrix, brute_force_topk, lsh_topk,
        )

        qt = pq.read_table(os.path.join(sf_dir, "embeddings.parquet"))
        qt = qt.filter(pc.less(qt["vec_id"], 10))
        Q = _batch_matrix(qt)
        qids = qt["vec_id"].to_numpy()
        ds = ray.data.read_parquet(
            os.path.join(sf_dir, "embeddings.parquet")
        )
        exact = brute_force_topk(ds, qids, Q, k=5).to_pandas()
        approx = lsh_topk(
            ds, qids, Q, dim=Q.shape[1], k=5, n_planes=4,
            axis_aligned=True,
        ).to_pandas()
        hit = exact.merge(
            approx, on=["query_id", "vec_id"], how="inner"
        ).groupby("query_id").size()
        per_q = pd.DataFrame({
            "query_id": np.sort(qids),
        })
        per_q["n_hits"] = per_q["query_id"].map(hit).fillna(0).astype(
            "int64"
        )
        per_q["recall_at_5"] = (per_q["n_hits"] / 5.0).round(6)
        return per_q

    def ann_ivf_topk(sf_dir):
        """IVF ANN: corpus assigned to nearest of 8 deterministic centroids
        (the first 8 vectors — reproducible cross-engine; swap in k-means
        for recall), each query probes its 3 closest centroid lists and
        ranks those exactly."""
        import pyarrow.compute as pc
        import pyarrow.parquet as pq
        import ray.data
        from debezium_incubator_ray.functions.ann import ivf_topk, _batch_matrix

        et = pq.read_table(os.path.join(sf_dir, "embeddings.parquet"))
        qt = et.filter(pc.less(et["vec_id"], 10))
        ct = et.filter(pc.less(et["vec_id"], 8)).sort_by([("vec_id", "ascending")])
        ds = ray.data.read_parquet(os.path.join(sf_dir, "embeddings.parquet"))
        out = ivf_topk(
            ds, qt["vec_id"].to_numpy(), _batch_matrix(qt),
            centroids=_batch_matrix(ct), k=5, nprobe=3,
        )
        return out.select(["query_id", "vec_id", "rank"])

    def ann_ivf_index_topk(sf_dir):
        """The PERSISTED IVF scale path: build_ivf_index writes the
        corpus hive-partitioned by nearest-centroid id (atomic publish +
        _CENTROIDS.json), then ivf_index_topk reads ONLY the probed
        cluster partitions off storage — nprobe/nc of the corpus bytes
        move instead of all of them. Same deterministic centroids and
        tie rules as ann_ivf_topk, so the same oracle pins byte-equality
        of index-backed search vs the in-memory assignment."""
        import os as _os
        import shutil as _shutil
        import pyarrow.compute as pc
        import pyarrow.parquet as pq
        import ray.data
        from debezium_incubator_ray.functions.ann import (
            _batch_matrix, build_ivf_index, ivf_index_topk,
        )

        et = pq.read_table(os.path.join(sf_dir, "embeddings.parquet"))
        qt = et.filter(pc.less(et["vec_id"], 10))
        ct = et.filter(pc.less(et["vec_id"], 8)).sort_by(
            [("vec_id", "ascending")])
        ds = ray.data.read_parquet(os.path.join(sf_dir, "embeddings.parquet"))
        idx = _os.path.join(
            "/tmp", "dbzray-ivf-index",
            f"{_os.path.basename(_os.path.normpath(sf_dir))}-{_os.getpid()}",
        )
        build_ivf_index(ds, _batch_matrix(ct), idx)
        try:
            out = ivf_index_topk(
                idx, qt["vec_id"].to_numpy(), _batch_matrix(qt),
                k=5, nprobe=3,
            )
            return out.select(["query_id", "vec_id", "rank"])
        finally:
            _shutil.rmtree(_os.path.dirname(idx), ignore_errors=True)

    def embedding_kmeans(sf_dir):
        """Spherical k-means (k=8, one recenter iteration, deterministic
        init = first 8 vectors, centroids rounded to 6dp per step):
        returns the final (vec_id, cluster) assignment."""
        import pyarrow.compute as pc
        import pyarrow.parquet as pq
        import ray.data
        from debezium_incubator_ray.functions.ann import (
            spherical_kmeans, _batch_matrix,
        )

        et = pq.read_table(os.path.join(sf_dir, "embeddings.parquet"))
        ct = et.filter(pc.less(et["vec_id"], 8)).sort_by([("vec_id", "ascending")])
        ds = ray.data.read_parquet(os.path.join(sf_dir, "embeddings.parquet"))
        _C, assign = spherical_kmeans(ds, _batch_matrix(ct), iters=1)
        return assign

    def multimodal_meta(sf_dir):
        import pyarrow as pa
        import pyarrow.compute as pc
        import ray.data
        from debezium_incubator_ray.functions.multimodal import DecodeStub

        ds = ray.data.read_parquet(
            os.path.join(sf_dir, "documents.parquet"), columns=["doc_id", "text"]
        )

        def to_payload(t: pa.Table) -> pa.Table:
            return pa.table(
                {
                    "doc_id": t["doc_id"],
                    "payload": pc.cast(
                        pc.cast(t["text"], pa.binary()), pa.large_binary()
                    ),
                }
            )

        withp = ds.map_batches(to_payload, batch_format="pyarrow", zero_copy_batch=True)
        decoded = withp.map_batches(
            DecodeStub, fn_constructor_kwargs={"payload_col": "payload"},
            batch_format="pyarrow", batch_size=128, concurrency=2,
        )

        def flatten(t: pa.Table) -> pa.Table:
            m = t["media_meta"].combine_chunks()
            return pa.table(
                {
                    "doc_id": t["doc_id"],
                    "n_bytes": m.field("n_bytes"),
                    "magic": m.field("magic"),
                }
            )

        return decoded.map_batches(flatten, batch_format="pyarrow", zero_copy_batch=True)

    def embedding_gram(sf_dir):
        """Corpus Gram matrix X'X as (i, j, gram) upper-triangle rows —
        each task ships a d(d+1)/2 float64 partial regardless of rows
        read; the driver folds #blocks partials. No shuffle."""
        import ray.data
        from debezium_incubator_ray.functions.linalg import gram_matrix

        emb = ray.data.read_parquet(
            os.path.join(sf_dir, "embeddings.parquet"),
            columns=["vec_id", "embedding"],
        )
        return gram_matrix(emb)

    def embedding_covariance(sf_dir):
        """Sample covariance (n-1 denominator) from the same one-pass
        Gram + mean partials: cov = (X'X - n·μμ')/(n-1)."""
        import ray.data
        from debezium_incubator_ray.functions.linalg import covariance_matrix

        emb = ray.data.read_parquet(
            os.path.join(sf_dir, "embeddings.parquet"),
            columns=["vec_id", "embedding"],
        )
        return covariance_matrix(emb)

    def text_bigram_topk(sf_dir):
        """Global top-50 adjacent token pairs (the BPE-merge counting
        primitive): per-batch distinct-bigram partial counts → one
        multi-key groupby-sum → per-block local top-k → driver merge of
        #blocks×k candidates. Ties break (cnt desc, w1, w2)."""
        import ray.data
        from debezium_incubator_ray.functions.text import bigram_topk

        docs = ray.data.read_parquet(
            os.path.join(sf_dir, "documents.parquet"),
            columns=["doc_id", "text"],
        )
        return bigram_topk(docs, k=50)

    def events_retention_cohorts(sf_dir):
        """Cohort retention matrix: first-activity ISO week cohorts ×
        active week → distinct users. Batches pre-reduce to distinct
        (user, week) pairs; one shuffle by user, one tiny cell groupby."""
        import ray.data
        from debezium_incubator_ray.functions.windows import retention_cohorts

        ev = ray.data.read_parquet(
            os.path.join(sf_dir, "events.parquet"),
            columns=["user_id", "ts"],
        )
        return retention_cohorts(ev)

    def join_top_revenue_orders(sf_dir):
        """TPC-H-Q3-shaped 3-way pipeline: the customer dimension filtered
        to one market segment broadcasts as a semi-join key set (nothing
        fact-sized moves), orders x lineitem co-locate in ONE bucketed
        shuffle whose in-bucket `post` finishes the per-order revenue agg
        (buckets own whole orderkeys), then per-block top-k + driver merge
        of #blocks x k candidates. Ties break (revenue desc, o_orderkey)."""
        import numpy as np
        import pyarrow as pa
        import pyarrow.compute as pc
        import pyarrow.parquet as pq
        import ray
        import ray.data
        from debezium_incubator_ray.functions.joins import shuffle_join

        k = 10
        cust = pq.read_table(
            os.path.join(sf_dir, "customer.parquet"),
            columns=["c_custkey", "c_mktsegment"],
        )
        keys = cust.filter(
            pc.equal(cust["c_mktsegment"], "BUILDING")
        )["c_custkey"].combine_chunks()
        key_ref = ray.put(keys)

        orders = ray.data.read_parquet(
            os.path.join(sf_dir, "orders.parquet"),
            columns=["o_orderkey", "o_custkey", "o_orderdate"],
        ).map_batches(
            lambda t: t.filter(
                pc.is_in(t["o_custkey"], value_set=ray.get(key_ref))
            ).drop_columns(["o_custkey"]),
            batch_format="pyarrow", zero_copy_batch=True,
        )
        li = ray.data.read_parquet(
            os.path.join(sf_dir, "lineitem.parquet"),
            columns=["l_orderkey", "l_extendedprice", "l_discount"],
        )

        def order_revenue(j: pa.Table) -> pa.Table:
            rev = pc.multiply(
                j["l_extendedprice"],
                pc.subtract(pa.scalar(1.0), j["l_discount"]),
            )
            g = (
                j.select(["o_orderkey", "o_orderdate"])
                .append_column("revenue", rev)
                .group_by(["o_orderkey", "o_orderdate"])
                .aggregate([("revenue", "sum")])
            )
            # select by NAME: pyarrow's group_by output column order is a
            # version-specific convention, not a contract
            return pa.table({
                "o_orderkey": g["o_orderkey"],
                "o_orderdate": g["o_orderdate"],
                "revenue": g["revenue_sum"],
            })

        def local_topk(t: pa.Table) -> pa.Table:
            if t.num_rows <= k:
                return t
            order = pc.sort_indices(
                t.append_column("_neg", pc.negate(t["revenue"])),
                sort_keys=[("_neg", "ascending"), ("o_orderkey", "ascending")],
            )
            return t.take(order.slice(0, k))

        per_order = shuffle_join(
            orders, li, on="o_orderkey", right_on="l_orderkey",
            post=order_revenue,
        ).map_batches(local_topk, batch_format="pyarrow")
        empty = pa.table({
            "o_orderkey": pa.array([], pa.int64()),
            "o_orderdate": pa.array([], pa.timestamp("us")),
            "revenue": pa.array([], pa.float64()),
        })
        merged = pa.concat_tables(
            [b for b in per_order.iter_batches(batch_format="pyarrow")]
            or [empty],
            promote_options="permissive",
        )
        return local_topk(merged)

    def join_regional_revenue(sf_dir):
        """TPC-H-Q5-shaped 6-table pipeline: region → nation resolves the
        ASIA nation set driver-side (rows of dims, not facts); customer
        and supplier nation maps broadcast ONCE via ray.put; orders x
        lineitem co-locate in the single fact shuffle whose in-bucket
        `post` maps both foreign keys through the broadcast dims, keeps
        only same-nation (customer==supplier) ASIA pairs and pre-reduces
        revenue per nation; a tiny final groupby sums #buckets x nations
        partials. Nothing fact-sized moves twice."""
        import numpy as np
        import pyarrow as pa
        import pyarrow.compute as pc
        import pyarrow.parquet as pq
        import ray
        import ray.data
        from ray.data.aggregate import Sum
        from debezium_incubator_ray.functions.joins import shuffle_join

        region = pq.read_table(os.path.join(sf_dir, "region.parquet"))
        nation = pq.read_table(os.path.join(sf_dir, "nation.parquet"))
        rk = region.filter(pc.equal(region["r_name"], "ASIA"))["r_regionkey"]
        asia = nation.filter(pc.is_in(nation["n_regionkey"], value_set=rk.combine_chunks()))
        nname = dict(zip(asia["n_nationkey"].to_pylist(),
                         asia["n_name"].to_pylist()))
        nat_keys = sorted(nname)
        nk_arr = pa.array(nat_keys, pa.int64())
        # broadcast only the ASIA slice of each dimension — non-ASIA rows
        # can never survive the same-nation filter, and every bucket task
        # builds a hash table over the broadcast side
        cust = pq.read_table(
            os.path.join(sf_dir, "customer.parquet"),
            columns=["c_custkey", "c_nationkey"],
        )
        cust = cust.filter(pc.is_in(cust["c_nationkey"], value_set=nk_arr))
        supp = pq.read_table(
            os.path.join(sf_dir, "supplier.parquet"),
            columns=["s_suppkey", "s_nationkey"],
        )
        supp = supp.filter(pc.is_in(supp["s_nationkey"], value_set=nk_arr))
        cust_ref = ray.put(cust)
        supp_ref = ray.put(supp)

        orders = ray.data.read_parquet(
            os.path.join(sf_dir, "orders.parquet"),
            columns=["o_orderkey", "o_custkey"],
        )
        li = ray.data.read_parquet(
            os.path.join(sf_dir, "lineitem.parquet"),
            columns=["l_orderkey", "l_suppkey", "l_extendedprice",
                     "l_discount"],
        )

        def nation_revenue(j: pa.Table) -> pa.Table:
            c = ray.get(cust_ref)
            s = ray.get(supp_ref)
            j = j.join(c, keys=["o_custkey"], right_keys=["c_custkey"])
            j = j.join(s, keys=["l_suppkey"], right_keys=["s_suppkey"])
            same = pc.and_(
                pc.equal(j["c_nationkey"], j["s_nationkey"]),
                pc.is_in(j["c_nationkey"],
                         value_set=pa.array(nat_keys, pa.int64())),
            )
            j = j.filter(same)
            rev = pc.multiply(
                j["l_extendedprice"],
                pc.subtract(pa.scalar(1.0), j["l_discount"]),
            )
            g = (
                pa.table({"nk": j["c_nationkey"], "revenue": rev})
                .group_by(["nk"])
                .aggregate([("revenue", "sum")])
            )
            return pa.table({"nk": g["nk"], "revenue": g["revenue_sum"]})

        parts = shuffle_join(
            orders, li, on="o_orderkey", right_on="l_orderkey",
            post=nation_revenue,
        )
        summed = parts.groupby("nk").aggregate(Sum("revenue", alias_name="revenue"))
        out = summed.to_pandas()
        out["n_name"] = out["nk"].map(nname)
        return out[["n_name", "revenue"]].sort_values(
            "revenue", ascending=False
        ).reset_index(drop=True)

    def part_copurchase_topk(sf_dir):
        """Top-20 part pairs co-occurring in the same order (basket
        co-occurrence mining): distinct (order, part) → one bucketed
        shuffle on hash(order) → vectorized in-bucket self-join + pair
        pre-count → tiny global groupby-sum → per-block top-k merge."""
        import ray.data
        from debezium_incubator_ray.functions.joins import copurchase_pairs

        li = ray.data.read_parquet(
            os.path.join(sf_dir, "lineitem.parquet"),
            columns=["l_orderkey", "l_partkey"],
        )
        return copurchase_pairs(li, "l_orderkey", "l_partkey", k=20)

    def dq_psi_drift(sf_dir):
        """Distribution drift between two source cohorts (even- vs
        odd-numbered src ids): PSI over exact integer length buckets —
        per-batch (bucket, cohort) partial counts, one tiny groupby,
        driver fold of O(buckets) rows."""
        import pyarrow as pa
        import pyarrow.compute as pc
        import ray.data
        from debezium_incubator_ray.functions.quality import psi_drift

        docs = ray.data.read_parquet(
            os.path.join(sf_dir, "documents.parquet"),
            columns=["source", "n_chars"],
        )

        def even_src(t: pa.Table):
            num = pc.cast(
                pc.utf8_slice_codeunits(t["source"], 3, 99), pa.int64()
            )
            return pc.equal(pc.bit_wise_and(num, 1), 0)

        return psi_drift(docs, "n_chars", even_src, bucket_width=64)

    def events_rollup(sf_dir):
        """ROLLUP aggregate in ONE pass via the shared grouping-sets
        lattice fold (stats.grouping_sets_sum). ``lvl`` = number of
        grouped columns (SQL: 2 - GROUPING(...) arithmetic)."""
        import pyarrow as pa
        import pyarrow.compute as pc
        import ray.data
        from debezium_incubator_ray.functions.stats import grouping_sets_sum

        ev = ray.data.read_parquet(
            os.path.join(sf_dir, "events.parquet"),
            columns=["event_type", "ts", "value"],
        )

        def derive(t: pa.Table) -> pa.Table:
            wk = pc.strftime(
                pc.floor_temporal(
                    t["ts"].combine_chunks(), unit="week",
                    week_starts_monday=True,
                ),
                format="%Y-%m-%d",
            )
            return pa.table({
                "event_type": t["event_type"],
                "week": wk,
                "v": pc.fill_null(pc.cast(t["value"], pa.float64()), 0.0),
            })

        return grouping_sets_sum(
            ev, derive, ["event_type", "week"],
            [(2, ["event_type", "week"]), (1, ["event_type"]), (0, [])],
            level_col="lvl",
        )

    def events_markov_transitions(sf_dir):
        """Per-user next-event transition matrix: one bucketed shuffle
        co-locates each user's ordered history, a vectorized in-bucket
        pass pairs adjacent events, the final groupby folds |types|^2
        tiny partial counts."""
        import ray.data
        from debezium_incubator_ray.functions.windows import (
            markov_transitions,
        )

        ev = ray.data.read_parquet(
            os.path.join(sf_dir, "events.parquet"),
            columns=["user_id", "event_type", "event_id"],
        )
        return markov_transitions(ev)

    def events_transition_entropy(sf_dir):
        """Behavioral predictability: conditional entropy H(next|prev) of
        the event-type chain, plus the marginal next-entropy and their
        difference (the information the previous event carries). Rides
        the markov_transitions fold — the driver finish touches only the
        |types|^2 count rows. Natural-log, rounded 6dp on both sides."""
        import numpy as np
        import pyarrow as pa
        import ray.data
        from debezium_incubator_ray.functions.kernels import collect_table
        from debezium_incubator_ray.functions.windows import (
            markov_transitions,
        )

        ev = ray.data.read_parquet(
            os.path.join(sf_dir, "events.parquet"),
            columns=["user_id", "event_type", "event_id"],
        )
        t = collect_table(markov_transitions(ev))
        c = t["cnt"].to_numpy(zero_copy_only=False).astype(np.float64)
        prev = t["prev_type"].to_pylist()
        total = c.sum()
        # H(next|prev) = -sum p(i,j) ln p(j|i); row totals by prev type
        row = {}
        for p, n in zip(prev, c):
            row[p] = row.get(p, 0.0) + n
        ci = np.array([row[p] for p in prev])
        h_cond = float(-(c / total * np.log(c / ci)).sum())
        # marginal next entropy from the same counts
        nxt = t["next_type"].to_pylist()
        col = {}
        for q, n in zip(nxt, c):
            col[q] = col.get(q, 0.0) + n
        cj = np.array(list(col.values()))
        h_next = float(-(cj / total * np.log(cj / total)).sum())
        return pa.table({
            "h_cond": pa.array([round(h_cond, 6)], pa.float64()),
            "h_next": pa.array([round(h_next, 6)], pa.float64()),
            "info_gain": pa.array([round(h_next - h_cond, 6)],
                                  pa.float64()),
        })

    def events_trigram_paths(sf_dir):
        """Top-20 three-step event-type paths over each user's ordered
        stream — the sequence-mining generalization of the transition
        matrix (funnel discovery / prefetch modeling). One bucketed
        shuffle per key history; vectorized n-gram slicing in-bucket;
        the fold is |types|^3 tiny rows with a driver top-k cut."""
        import ray.data
        from debezium_incubator_ray.functions.windows import (
            sequence_ngram_counts,
        )

        ev = ray.data.read_parquet(
            os.path.join(sf_dir, "events.parquet"),
            columns=["user_id", "event_type", "event_id"],
        )
        return sequence_ngram_counts(ev, n=3, k=20)

    def sample_weighted_topk(sf_dir):
        """Deterministic weight-proportional sample without replacement
        (Efraimidis-Spirakis with a hash-derived uniform): the 200 docs
        with the largest ln(u)/n_chars keys — longer docs proportionally
        likelier, byte-reproducible at any parallelism."""
        import ray.data
        from debezium_incubator_ray.functions.sample import (
            weighted_sample_topk,
        )

        docs = ray.data.read_parquet(
            os.path.join(sf_dir, "documents.parquet"),
            columns=["doc_id", "n_chars"],
        )
        return weighted_sample_topk(docs, "n_chars", k=200)

    def corpus_shuffle_head(sf_dir):
        """Reproducible global shuffle (Lehmer permutation + ONE
        distributed range-partitioned sort) verified end-to-end through
        its global head: limit(100) after the sort is the 100 smallest
        permutation values corpus-wide — any mis-sorted range partition
        changes the head set."""
        import ray.data
        from debezium_incubator_ray.functions.sample import (
            deterministic_shuffle,
        )

        docs = ray.data.read_parquet(
            os.path.join(sf_dir, "documents.parquet"),
            columns=["doc_id", "n_chars"],
        )
        return deterministic_shuffle(docs).limit(100)

    def events_pivot_profile(sf_dir):
        """Per-user activity profile: event_type pivoted to count columns
        (feature-store shape). Per-batch Arrow group-count pivots wide
        locally; the one shuffle moves per-user-per-block int64 rows."""
        import ray.data
        from debezium_incubator_ray.functions.windows import pivot_counts

        ev = ray.data.read_parquet(
            os.path.join(sf_dir, "events.parquet"),
            columns=["user_id", "event_type"],
        )
        return pivot_counts(
            ev, types=["click", "error", "purchase", "signup", "view"]
        )

    def events_lag_gaps(sf_dir):
        """Per-user inter-event gap stats — the LAG() window primitive:
        one bucketed shuffle co-locates each user's history, a vectorized
        in-bucket pass (sort, adjacent int64-microsecond diff, boundary
        mask, Arrow group-agg) emits final per-user rows. All-integer
        outputs, exact at any parallelism."""
        import ray.data
        from debezium_incubator_ray.functions.windows import lag_gap_stats

        ev = ray.data.read_parquet(
            os.path.join(sf_dir, "events.parquet"),
            columns=["user_id", "ts", "event_id"],
        )
        return lag_gap_stats(ev)

    def events_peak_window(sf_dir):
        """Per-user peak 3-event moving average (max of AVG OVER a sliding
        row frame): bucketed shuffle co-locates each user's history, one
        lexsort + cumulative-sum frame math + maximum.reduceat in-bucket —
        the per-event window column never leaves the tasks."""
        import ray.data
        from debezium_incubator_ray.functions.windows import peak_window_avg

        ev = ray.data.read_parquet(
            os.path.join(sf_dir, "events.parquet"),
            columns=["user_id", "ts", "event_id", "value"],
        )
        return peak_window_avg(ev, window=3)

    def events_argmax_ties(sf_dir):
        """Argmax-with-ties (QUALIFY value = MAX(value) OVER user): per-batch
        in-batch-max pre-filter is the combiner, one narrow bucketed shuffle,
        Arrow group-max + equality filter in-bucket."""
        import ray.data
        from debezium_incubator_ray.functions.windows import argmax_rows

        ev = ray.data.read_parquet(
            os.path.join(sf_dir, "events.parquet"),
            columns=["user_id", "event_id", "value"],
        )
        return argmax_rows(ev)

    def spend_above_avg(sf_dir):
        """Customers whose total spend exceeds the global mean per-customer
        total — broadcast-threshold filter: per-batch partial sums fold
        through one custkey groupby; the mean of that (small) aggregate is
        computed once and the comparison streams."""
        import pyarrow as pa
        import pyarrow.compute as pc
        import ray.data
        from ray.data.aggregate import Sum

        ds = ray.data.read_parquet(
            os.path.join(sf_dir, "orders.parquet"),
            columns=["o_custkey", "o_totalprice"],
        )

        def partial(t: pa.Table) -> pa.Table:
            g = t.group_by("o_custkey").aggregate([("o_totalprice", "sum")])
            return pa.table(
                {"o_custkey": g["o_custkey"], "psum": g["o_totalprice_sum"]}
            )

        totals = (
            ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
            .groupby("o_custkey")
            .aggregate(Sum("psum", alias_name="total"))
            # pinned: consumed twice (mean fold + final filter) — without
            # materialize each consumption re-runs the orders scan+groupby
            .materialize()
        )
        # the per-customer aggregate is small by construction; its mean is
        # one more tiny fold (never the raw orders)
        stats = totals.map_batches(
            lambda t: pa.table({
                "_k": pa.array([0], pa.int64()),
                "s": pa.array([pc.sum(t["total"]).as_py() or 0.0]),
                "n": pa.array([t.num_rows], pa.int64()),
            }),
            batch_format="pyarrow",
        ).groupby("_k").aggregate(Sum("s", alias_name="s"), Sum("n", alias_name="n")).take_all()[0]
        avg = stats["s"] / max(stats["n"], 1)

        def finish(t: pa.Table) -> pa.Table:
            keep = pc.greater(t["total"], pa.scalar(avg, pa.float64()))
            out = t.filter(pc.fill_null(keep, False))
            return pa.table({
                "o_custkey": out["o_custkey"],
                "total": pc.round(out["total"], ndigits=3),
            })

        return totals.map_batches(finish, batch_format="pyarrow")

    def text_zipf_slope(sf_dir):
        """Zipf's-law slope over the top-200 vocabulary: per-batch count
        partials, one term groupby, two-level top-k cut, closed-form
        least-squares on the 200 sufficient statistics."""
        import ray.data
        from debezium_incubator_ray.functions.text import zipf_slope

        docs = ray.data.read_parquet(
            os.path.join(sf_dir, "documents.parquet"), columns=["text"]
        )
        return zipf_slope(docs, top_n=200)

    def text_bm25_topk(sf_dir):
        """BM25 top-20 docs for a fixed query-term set: one tiny stats fold
        (N, avgdl, per-term df), stats broadcast in the closure, vectorized
        per-batch scoring with a partial top-k combiner."""
        import ray.data
        from debezium_incubator_ray.functions.text import bm25_topk

        docs = ray.data.read_parquet(
            os.path.join(sf_dir, "documents.parquet"),
            columns=["doc_id", "text"],
        )
        return bm25_topk(docs, ("join", "vector", "stream"), k=20)

    def dq_histogram(sf_dir):
        """Equi-width value histogram per event_type over the global
        [min,max]: one tiny min/max fold, then per-batch bincount partials —
        two streaming passes, no wide shuffle."""
        import ray.data
        from debezium_incubator_ray.functions.quality import value_histogram

        ev = ray.data.read_parquet(
            os.path.join(sf_dir, "events.parquet"),
            columns=["event_type", "value"],
        )
        return value_histogram(ev, n_buckets=16)

    def text_type_token_ratio(sf_dir):
        """Per-doc lexical diversity (distinct/total tokens): documents are
        row-complete, so this is one shuffle-free map_batches pass."""
        import ray.data
        from debezium_incubator_ray.functions.text import type_token_ratio

        docs = ray.data.read_parquet(
            os.path.join(sf_dir, "documents.parquet"),
            columns=["doc_id", "text"],
        )
        return type_token_ratio(docs)

    def events_path_signatures(sf_dir):
        """First-5-event behavioral paths counted across users: bucketed
        shuffle co-locates histories; in-bucket lexsort + clipped list
        offsets + pc.binary_join builds every signature in one kernel."""
        import ray.data
        from debezium_incubator_ray.functions.windows import path_signatures

        ev = ray.data.read_parquet(
            os.path.join(sf_dir, "events.parquet"),
            columns=["user_id", "event_type", "event_id"],
        )
        return path_signatures(ev, first_n=5)

    def join_anti_customers(sf_dir):
        """Big-big ANTI join (decontamination shape at lake scale):
        customers with no order since 2001-01-01 (churn), via the
        partitioned-hash-join exchange with Arrow's 'left anti' kernel per
        bucket — the probe side ships only its key column, pre-filtered at
        the read (row-group pruning) — then a partial-agg rollup per
        nation."""
        import datetime
        import pyarrow as pa
        import pyarrow.compute as pc
        import pyarrow.dataset as pads
        import ray.data
        from ray.data.aggregate import Sum
        from debezium_incubator_ray.functions.joins import shuffle_join

        cust = ray.data.read_parquet(
            os.path.join(sf_dir, "customer.parquet"),
            columns=["c_custkey", "c_nationkey", "c_acctbal"],
        )
        okeys = ray.data.read_parquet(
            os.path.join(sf_dir, "orders.parquet"), columns=["o_custkey"],
            filter=(pads.field("o_orderdate")
                    >= pa.scalar(datetime.datetime(2001, 1, 1))),
        )
        anti = shuffle_join(
            cust, okeys, on="c_custkey", right_on="o_custkey",
            join_type="left anti",
        )

        def partial(t: pa.Table) -> pa.Table:
            g = t.group_by(["c_nationkey"]).aggregate(
                [("c_custkey", "count"), ("c_acctbal", "sum")]
            )
            return pa.table({
                "c_nationkey": g["c_nationkey"],
                "cnt": pc.cast(g["c_custkey_count"], pa.int64()),
                "bal": g["c_acctbal_sum"],
            })

        folded = (
            anti.map_batches(partial, batch_format="pyarrow",
                             zero_copy_batch=True)
            .groupby("c_nationkey")
            .aggregate(Sum("cnt", alias_name="cnt"),
                       Sum("bal", alias_name="bal"))
        )

        def finish(t: pa.Table) -> pa.Table:
            return pa.table({
                "c_nationkey": t["c_nationkey"],
                "n_customers": pc.cast(t["cnt"], pa.int64()),
                "acctbal_sum": pc.round(t["bal"], ndigits=3),
            })

        return folded.map_batches(finish, batch_format="pyarrow")

    def events_cube(sf_dir):
        """CUBE aggregate in ONE pass via the shared grouping-sets
        lattice fold (stats.grouping_sets_sum) over the full power set of
        (event_type, day-of-week). ``gid`` mirrors SQL GROUPING() bits."""
        import pyarrow as pa
        import pyarrow.compute as pc
        import ray.data
        from debezium_incubator_ray.functions.stats import grouping_sets_sum

        ev = ray.data.read_parquet(
            os.path.join(sf_dir, "events.parquet"),
            columns=["event_type", "ts", "value"],
        )

        def derive(t: pa.Table) -> pa.Table:
            # Sunday=0 .. Saturday=6, matching DuckDB dayofweek()
            dow = pc.cast(
                pc.day_of_week(t["ts"].combine_chunks(),
                               count_from_zero=True, week_start=7),
                pa.int64(),
            )
            return pa.table({
                "event_type": t["event_type"],
                "dow": dow,
                "v": pc.fill_null(pc.cast(t["value"], pa.float64()), 0.0),
            })

        return grouping_sets_sum(
            ev, derive, ["event_type", "dow"],
            [(0, ["event_type", "dow"]), (1, ["event_type"]),
             (2, ["dow"]), (3, [])],
            level_col="gid",
        )

    def sample_per_group_k(sf_dir):
        """Deterministic per-group sample: the k=100 events with the
        smallest Lehmer-permutation value per event_type — uniform within
        each group, byte-reproducible at any parallelism (no RNG, no
        seen-state), expressed as grouped top-k over the stamped perm so
        only k x groups x blocks rows survive the combiner."""
        import numpy as np
        import pyarrow as pa
        import ray.data
        from debezium_incubator_ray.functions.sample import _lehmer_perm
        from debezium_incubator_ray.functions.windows import topk_per_group

        ev = ray.data.read_parquet(
            os.path.join(sf_dir, "events.parquet"),
            columns=["event_type", "event_id"],
        )

        def stamp(t: pa.Table) -> pa.Table:
            ids = t["event_id"].combine_chunks().to_numpy(
                zero_copy_only=False
            )
            perm = _lehmer_perm(
                ids, "event_id", seed=12345, mult=2654435761,
                mod=2147483647,
            ).astype(np.int64)
            t = t.append_column("perm", pa.array(perm))
            return t.append_column("neg_perm", pa.array(-perm))

        picked = topk_per_group(
            ev.map_batches(stamp, batch_format="pyarrow",
                           zero_copy_batch=True),
            group_col="event_type", order_col="neg_perm",
            id_col="event_id", k=100,
        )
        return picked.drop_columns(["neg_perm"])

    def join_range_price_tier(sf_dir):
        """Broadcast RANGE (band) join: every order finds its containing
        [lo, hi) price band via one vectorized searchsorted against the
        broadcast sorted band edges — the small-side interval join that
        never shuffles the fact table — then a partial-agg rollup per
        tier."""
        import numpy as np
        import pyarrow as pa
        import pyarrow.compute as pc
        import ray.data
        from ray.data.aggregate import Sum

        edges = np.array(
            [0.0, 50_000.0, 100_000.0, 150_000.0, 200_000.0, 250_000.0,
             300_000.0], dtype=np.float64,
        )

        orders = ray.data.read_parquet(
            os.path.join(sf_dir, "orders.parquet"), columns=["o_totalprice"]
        )

        def partial(t: pa.Table) -> pa.Table:
            price = t["o_totalprice"].combine_chunks().to_numpy(
                zero_copy_only=False
            )
            tier = np.searchsorted(edges, price, side="right") - 1
            g = pa.table({
                "tier": pa.array(tier.astype(np.int64)),
                "price": t["o_totalprice"],
            }).group_by(["tier"]).aggregate(
                [("price", "count"), ("price", "sum")]
            )
            return pa.table({
                "tier": g["tier"],
                "cnt": pc.cast(g["price_count"], pa.int64()),
                "rev": g["price_sum"],
            })

        folded = (
            orders.map_batches(partial, batch_format="pyarrow",
                               zero_copy_batch=True)
            .groupby("tier")
            .aggregate(Sum("cnt", alias_name="cnt"),
                       Sum("rev", alias_name="rev"))
        )

        def finish(t: pa.Table) -> pa.Table:
            return pa.table({
                "tier": t["tier"],
                "n_orders": pc.cast(t["cnt"], pa.int64()),
                "revenue": pc.round(t["rev"], ndigits=3),
            })

        return folded.map_batches(finish, batch_format="pyarrow")

    def join_full_outer_daily(sf_dir):
        """FULL OUTER reconciliation of two independent daily series
        (orders vs events): each side streams per-batch per-day count
        partials (the combiner — only #blocks x |days| tiny rows leave
        the tasks), and because day keys are CALENDAR-BOUNDED the final
        fold + full-outer join runs on the driver in one Arrow kernel —
        three Ray shuffles of metadata-sized streams would be pure fixed
        overhead (measured ~2 s each on |days|~2.4k rows). The
        distributed full-outer path (joins.shuffle_join
        join_type='full outer') remains the tool for UNBOUNDED keys."""
        import pyarrow as pa
        import pyarrow.compute as pc
        import ray.data

        def daily(path, ts_col, out):
            ds = ray.data.read_parquet(path, columns=[ts_col])

            def partial(t: pa.Table) -> pa.Table:
                d = pc.strftime(t[ts_col].combine_chunks(),
                                format="%Y-%m-%d")
                g = pa.table({"d": d}).group_by(["d"]).aggregate(
                    [([], "count_all")]
                )
                return pa.table({
                    "d": g["d"],
                    out: pc.cast(g["count_all"], pa.int64()),
                })

            parts = pa.concat_tables(
                b for b in ds.map_batches(
                    partial, batch_format="pyarrow", zero_copy_batch=True
                ).iter_batches(batch_format="pyarrow")
            )
            g = parts.group_by("d").aggregate([(out, "sum")])
            return g.rename_columns(["d", out])

        o = daily(os.path.join(sf_dir, "orders.parquet"), "o_orderdate",
                  "n_orders")
        e = daily(os.path.join(sf_dir, "events.parquet"), "ts",
                  "n_events")
        j = o.join(e, keys=["d"], join_type="full outer")
        return pa.table({
            "day": j["d"],
            "n_orders": pc.cast(j["n_orders"], pa.int64()),
            "n_events": pc.cast(j["n_events"], pa.int64()),
        })

    def join_semi_recent_orders(sf_dir):
        """SEMI join (TPC-H Q4 shape): orders with at least one lineitem
        shipped since 2001-01-01, counted per priority — probe side
        pre-filtered at the read and shipped key-only; Arrow 'left semi'
        per bucket emits each qualifying order once."""
        import datetime
        import pyarrow as pa
        import pyarrow.compute as pc
        import pyarrow.dataset as pads
        import ray.data
        from ray.data.aggregate import Sum
        from debezium_incubator_ray.functions.joins import shuffle_join

        orders = ray.data.read_parquet(
            os.path.join(sf_dir, "orders.parquet"),
            columns=["o_orderkey", "o_orderpriority"],
        )
        li = ray.data.read_parquet(
            os.path.join(sf_dir, "lineitem.parquet"), columns=["l_orderkey"],
            filter=(pads.field("l_shipdate")
                    >= pa.scalar(datetime.datetime(2001, 1, 1))),
        )
        semi = shuffle_join(orders, li, on="o_orderkey",
                            right_on="l_orderkey", join_type="left semi")

        def partial(t: pa.Table) -> pa.Table:
            g = t.group_by(["o_orderpriority"]).aggregate([([], "count_all")])
            return pa.table({
                "o_orderpriority": g["o_orderpriority"],
                "cnt": pc.cast(g["count_all"], pa.int64()),
            })

        folded = (
            semi.map_batches(partial, batch_format="pyarrow",
                             zero_copy_batch=True)
            .groupby("o_orderpriority")
            .aggregate(Sum("cnt", alias_name="cnt"))
        )
        return folded.map_batches(
            lambda t: pa.table({
                "o_orderpriority": t["o_orderpriority"],
                "n_orders": pc.cast(t["cnt"], pa.int64()),
            }),
            batch_format="pyarrow",
        )

    def embedding_quantize_int8(sf_dir):
        """Per-dimension int8 scalar quantization calibration + audit:
        corpus-global min/max per dim (pass 1, O(d) driver fold), then the
        broadcast range re-codes every vector and per-dim mean code comes
        back (pass 2) — the compression step before a 100 TB ANN build."""
        import ray.data
        from debezium_incubator_ray.functions.linalg import (
            quantize_int8_stats,
        )

        emb = ray.data.read_parquet(
            os.path.join(sf_dir, "embeddings.parquet"), columns=["embedding"]
        )
        return quantize_int8_stats(emb)

    def text_hashed_features(sf_dir):
        """Hashing-trick featurization audit: md5-bucket histogram of all
        corpus tokens (32 buckets) — vocabulary-free, one md5 per DISTINCT
        token per batch, 32 partial rows per block."""
        import ray.data
        from debezium_incubator_ray.functions.text import (
            hashed_feature_counts,
        )

        docs = ray.data.read_parquet(
            os.path.join(sf_dir, "documents.parquet"), columns=["text"]
        )
        return hashed_feature_counts(docs, buckets=32)

    def events_type_entropy(sf_dir):
        """Per-user Shannon entropy of the event-type distribution — the
        behavioral-diversity feature. Per-batch partials shrink rows to
        (user, type, cnt); only those tiny partials shuffle."""
        import ray.data
        from debezium_incubator_ray.functions.stats import group_entropy

        ev = ray.data.read_parquet(
            os.path.join(sf_dir, "events.parquet"),
            columns=["user_id", "event_type"],
        )
        return group_entropy(ev, "user_id", "event_type")

    def stats_regression_tax(sf_dir):
        """Per-returnflag least-squares line of l_tax on l_discount plus
        Pearson correlation — REGR_SLOPE/INTERCEPT/CORR as one streaming
        pass of six moment sums per group; raw rows never shuffle."""
        import ray.data
        from debezium_incubator_ray.functions.stats import group_regression

        li = ray.data.read_parquet(
            os.path.join(sf_dir, "lineitem.parquet"),
            columns=["l_returnflag", "l_discount", "l_tax"],
        )
        return group_regression(li, "l_returnflag", "l_discount", "l_tax")

    def dq_benford(sf_dir):
        """Benford first-digit conformance of order totals — the classic
        fraud/data-quality screen. Each block folds to nine digit counts;
        the finish compares observed share to log10(1 + 1/d)."""
        import ray.data
        from debezium_incubator_ray.functions.stats import benford_digits

        orders = ray.data.read_parquet(
            os.path.join(sf_dir, "orders.parquet"), columns=["o_totalprice"]
        )
        return benford_digits(orders, "o_totalprice")

    def stats_group_means(sf_dir):
        """Arithmetic / geometric / harmonic mean of l_quantity per
        returnflag from one pass of partial sums (n, Σv, Σln v, Σ1/v)."""
        import ray.data
        from debezium_incubator_ray.functions.stats import (
            group_generalized_means,
        )

        li = ray.data.read_parquet(
            os.path.join(sf_dir, "lineitem.parquet"),
            columns=["l_returnflag", "l_quantity"],
        )
        return group_generalized_means(li, "l_returnflag", "l_quantity")

    def events_first_touch(sf_dir):
        """First/last-touch attribution per user — arg_min/arg_max by
        event_id via int64 packing, so plain Min/Max aggregates carry
        the answer and no row leaves its block unaggregated."""
        import ray.data
        from debezium_incubator_ray.functions.windows import (
            first_last_per_group,
        )

        ev = ray.data.read_parquet(
            os.path.join(sf_dir, "events.parquet"),
            columns=["user_id", "event_id", "event_type"],
        )
        out = first_last_per_group(ev, "user_id", "event_id", "event_type")
        return out.map_batches(
            lambda t: t.rename_columns(
                ["user_id", "n_events", "first_type", "last_type"]
            ),
            batch_format="pyarrow",
        )

    def events_ewma(sf_dir):
        """Final EWMA of `value` per user in event_id order
        (adjust=True weights) — keys co-locate into hash buckets, one
        lexsort+reduceat kernel per bucket."""
        import ray.data
        from debezium_incubator_ray.functions.windows import group_ewma

        ev = ray.data.read_parquet(
            os.path.join(sf_dir, "events.parquet"),
            columns=["user_id", "event_id", "value"],
        )
        return group_ewma(ev, "user_id", "event_id", "value", alpha=0.2)

    def stats_dense_rank(sf_dir):
        """DENSE_RANK of every order's total price without a global
        sort: per-bucket DISTINCT counts (shuffle bounded by distinct
        values, not rows) give the dense offsets, then the standard
        value-bucket shuffle dense-ranks in place."""
        import ray.data
        from debezium_incubator_ray.functions.rank import global_dense_rank

        orders = ray.data.read_parquet(
            os.path.join(sf_dir, "orders.parquet"),
            columns=["o_orderkey", "o_totalprice"],
        )
        return global_dense_rank(orders, "o_totalprice")

    def stats_percent_rank(sf_dir):
        """PERCENT_RANK of every order's total price without a global
        sort: equi-width value buckets give cross-bucket order for free;
        one bucket-histogram aggregate plus one bucketed shuffle. Ranks
        raw stored values (not float re-aggregations) so ties are
        genuine data ties, handled min-rank on both sides — ranking a
        SUM would compare one-ulp summation-order accidents."""
        import ray.data
        from debezium_incubator_ray.functions.rank import percent_rank

        orders = ray.data.read_parquet(
            os.path.join(sf_dir, "orders.parquet"),
            columns=["o_orderkey", "o_totalprice"],
        )
        return percent_rank(orders, "o_totalprice")

    def dq_outliers_mad(sf_dir):
        """Robust outlier screen per event type: median, MAD, and the
        count beyond 3 * 1.4826 * MAD — exact order statistics, one
        groupby co-location, one numpy kernel per group."""
        import ray.data
        from debezium_incubator_ray.functions.quality import mad_outliers

        ev = ray.data.read_parquet(
            os.path.join(sf_dir, "events.parquet"),
            columns=["event_type", "value"],
        )
        return mad_outliers(ev, "event_type", "value", k=3.0)

    def graph_pagerank(sf_dir):
        """PageRank over the part<->supplier bipartite graph (nodes
        2*partkey / 2*suppkey+1), 5 power iterations at damping 0.85 —
        per-iteration distributed hash join + narrow groupby; the edge
        list pins once with source degree attached."""
        import ray.data
        import numpy as np
        import pyarrow as pa
        import pyarrow.compute as pc
        from debezium_incubator_ray.functions.graph import (
            distinct_edges,
            pagerank,
        )

        li = ray.data.read_parquet(
            os.path.join(sf_dir, "lineitem.parquet"),
            columns=["l_partkey", "l_suppkey"],
        )

        def both_dirs(t):
            p = (
                pc.multiply(pc.cast(t["l_partkey"], pa.int64()), 2)
                .combine_chunks()
                .to_numpy(zero_copy_only=False)
            )
            s = (
                pc.add(
                    pc.multiply(pc.cast(t["l_suppkey"], pa.int64()), 2), 1
                )
                .combine_chunks()
                .to_numpy(zero_copy_only=False)
            )
            return pa.table({
                "src": pa.array(np.concatenate([p, s])),
                "dst": pa.array(np.concatenate([s, p])),
            })

        edges = distinct_edges(
            li.map_batches(
                both_dirs, batch_format="pyarrow", zero_copy_batch=True
            ),
            "src",
            "dst",
        )
        return pagerank(edges, damping=0.85, iters=5)

    def graph_triangles(sf_dir):
        """Triangle count of the top-2000 co-purchase subgraph (part
        pairs most often bought in the same order): degree-ordered wedge
        generation + pair-hash bucketed closing-edge join — the O(m^1.5)
        distributed triangle algorithm, never a hub's full neighborhood
        expansion. The top-k edge cut breaks ties (cnt desc, a, b),
        mirrored by the oracle."""
        import pyarrow as pa
        import ray.data
        from debezium_incubator_ray.functions.joins import copurchase_pairs
        from debezium_incubator_ray.functions.graph import triangle_count

        li = ray.data.read_parquet(
            os.path.join(sf_dir, "lineitem.parquet"),
            columns=["l_orderkey", "l_partkey"],
        )
        top = copurchase_pairs(li, "l_orderkey", "l_partkey", k=2000)
        edges = ray.data.from_arrow(pa.table({
            "src": top["l_partkey_a"], "dst": top["l_partkey_b"],
        }))
        return triangle_count(edges, buckets=32)

    def graph_local_clustering(sf_dir):
        """Top-50 most clique-like parts of the co-purchase graph by
        LOCAL clustering coefficient 2*tri(v)/(deg(v)*(deg(v)-1)):
        degree-ordered wedges KEEP their center so a closed wedge
        credits all three corners; per-node (node, tri) partials fold in
        the closing-edge buckets and degrees attach by a bucketed left
        join (zero-triangle nodes keep lcc = 0). Ties break
        (lcc desc, node asc) on the ROUNDED value, mirrored by the
        oracle."""
        import pyarrow as pa
        import ray.data
        from debezium_incubator_ray.functions.joins import copurchase_pairs
        from debezium_incubator_ray.functions.graph import local_clustering

        li = ray.data.read_parquet(
            os.path.join(sf_dir, "lineitem.parquet"),
            columns=["l_orderkey", "l_partkey"],
        )
        top = copurchase_pairs(li, "l_orderkey", "l_partkey", k=2000)
        edges = ray.data.from_arrow(pa.table({
            "src": top["l_partkey_a"], "dst": top["l_partkey_b"],
        }))
        return local_clustering(edges, k=50, buckets=32)

    def graph_assortativity(sf_dir):
        """Degree assortativity of the top-2000 co-purchase subgraph: do
        frequently-co-bought hub parts link to other hubs? Degree table
        folds from per-block endpoint counts (|V| rows, broadcast once);
        moment sums are exact int64 — the edges never shuffle."""
        import pyarrow as pa
        import ray.data
        from debezium_incubator_ray.functions.joins import copurchase_pairs
        from debezium_incubator_ray.functions.graph import degree_assortativity

        li = ray.data.read_parquet(
            os.path.join(sf_dir, "lineitem.parquet"),
            columns=["l_orderkey", "l_partkey"],
        )
        top = copurchase_pairs(li, "l_orderkey", "l_partkey", k=2000)
        edges = ray.data.from_arrow(pa.table({
            "src": top["l_partkey_a"], "dst": top["l_partkey_b"],
        }))
        return degree_assortativity(edges, "src", "dst")

    def graph_bfs_hops(sf_dir):
        """Multi-source BFS hop distances (<= 3 hops) from the 5
        lowest-id nodes of the top-2000 co-purchase subgraph: per hop ONE
        frontier x adjacency hash join + ONE anti-join against the
        (distributed, never driver-side) visited set."""
        import numpy as np
        import pyarrow as pa
        import ray.data
        from debezium_incubator_ray.functions.joins import copurchase_pairs
        from debezium_incubator_ray.functions.graph import bfs_hops

        li = ray.data.read_parquet(
            os.path.join(sf_dir, "lineitem.parquet"),
            columns=["l_orderkey", "l_partkey"],
        )
        top = copurchase_pairs(li, "l_orderkey", "l_partkey", k=2000)
        nodes = np.unique(np.concatenate([
            top["l_partkey_a"].to_numpy(zero_copy_only=False),
            top["l_partkey_b"].to_numpy(zero_copy_only=False),
        ]))
        seeds = [int(x) for x in nodes[:5]]
        edges = ray.data.from_arrow(pa.table({
            "src": top["l_partkey_a"], "dst": top["l_partkey_b"],
        }))
        return bfs_hops(edges, seeds, max_hops=3, buckets=32)

    def graph_connected_components(sf_dir):
        """Connected components of the top-2000 co-purchase subgraph:
        distributed hash-min label propagation with pointer jumping
        (label <- label(label) collapses chains exponentially, so rounds
        are O(log diameter)); per-round work is two hash joins + one
        bucketed min reduce, label state never on the driver. Output is
        one (comp, n_nodes) row per component, comp = min node id."""
        import pyarrow as pa
        import ray.data
        from debezium_incubator_ray.functions.joins import copurchase_pairs
        from debezium_incubator_ray.functions.graph import (
            connected_components,
        )

        li = ray.data.read_parquet(
            os.path.join(sf_dir, "lineitem.parquet"),
            columns=["l_orderkey", "l_partkey"],
        )
        top = copurchase_pairs(li, "l_orderkey", "l_partkey", k=2000)
        edges = ray.data.from_arrow(pa.table({
            "src": top["l_partkey_a"], "dst": top["l_partkey_b"],
        }))
        return connected_components(edges, buckets=32)

    def dq_corr_matrix(sf_dir):
        """Pairwise Pearson correlation heatmap over the four lineitem
        measures in one streaming pass — per-pair masked moment sums,
        one single-row fold, closed-form finish."""
        import ray.data
        from debezium_incubator_ray.functions.stats import corr_matrix

        cols = ["l_quantity", "l_extendedprice", "l_discount", "l_tax"]
        li = ray.data.read_parquet(
            os.path.join(sf_dir, "lineitem.parquet"), columns=cols,
        )
        return corr_matrix(li, cols)

    def events_group_percent_rank(sf_dir):
        """PERCENT_RANK of each event's value within its event type: one
        bounded hash-bucket shuffle, vectorized first-occurrence rank
        scan per bucket."""
        import ray.data
        from debezium_incubator_ray.functions.rank import (
            grouped_percent_rank,
        )

        ev = ray.data.read_parquet(
            os.path.join(sf_dir, "events.parquet"),
            columns=["event_id", "event_type", "value"],
        )
        return grouped_percent_rank(ev, "event_type", "value")

    def events_top_user(sf_dir):
        """Most active user per event type (count desc, user_id asc
        tie-break): per-batch pair-count partials, one narrow 2-key fold
        over the pre-reduced pairs, then a per-type vectorized top-1."""
        import pyarrow as pa
        import pyarrow.compute as pc
        import ray.data
        from ray.data.aggregate import Sum

        ev = ray.data.read_parquet(
            os.path.join(sf_dir, "events.parquet"),
            columns=["event_type", "user_id"],
        )

        def partial(t: pa.Table) -> pa.Table:
            g = t.group_by(["event_type", "user_id"]).aggregate(
                [([], "count_all")]
            )
            return pa.table({
                "event_type": g["event_type"],
                "user_id": g["user_id"],
                "cnt": pc.cast(g["count_all"], pa.int64()),
            })

        folded = (
            ev.map_batches(partial, batch_format="pyarrow",
                           zero_copy_batch=True)
            .groupby(["event_type", "user_id"])
            .aggregate(Sum("cnt", alias_name="cnt"))
        )

        def top1(g: pa.Table) -> pa.Table:
            g = pa.table({
                "event_type": g["event_type"],
                "user_id": g["user_id"],
                "cnt": pc.cast(g["cnt"], pa.int64()),
            })
            order = pc.sort_indices(
                g.append_column("_neg", pc.negate(g["cnt"])),
                sort_keys=[("_neg", "ascending"),
                           ("user_id", "ascending")],
            )
            return g.take(order.slice(0, 1))

        return folded.groupby("event_type").map_groups(
            top1, batch_format="pyarrow"
        )

    def stats_higher_moments(sf_dir):
        """Per-type sample skewness and excess kurtosis (the SQL
        bias-adjusted G1/G2 estimators) from one streaming pass of raw
        power sums — no co-location of the group ever needed."""
        import ray.data
        from debezium_incubator_ray.functions.stats import (
            group_higher_moments,
        )

        ev = ray.data.read_parquet(
            os.path.join(sf_dir, "events.parquet"),
            columns=["event_type", "value"],
        )
        return group_higher_moments(ev, "event_type", "value")

    def stats_welch_ttest(sf_dir):
        """Welch's unequal-variance t between purchase and view event
        values: one streaming power-sum fold (2 partial rows per block),
        closed-form t and Welch-Satterthwaite df on the driver — the
        A/B-test primitive, no row co-location ever."""
        import ray.data
        from debezium_incubator_ray.functions.stats import welch_ttest

        ev = ray.data.read_parquet(
            os.path.join(sf_dir, "events.parquet"),
            columns=["event_type", "value"],
        )
        return welch_ttest(ev, "value", "event_type", "purchase", "view")

    def stats_anova_f(sf_dir):
        """One-way ANOVA F across all event types from the same power-sum
        fold: does mean value differ by type at all? Mean squares (not
        raw SS) are emitted so the gauge stays O(variance)-scaled and
        summation-order float noise stays far inside the 6-dp gate."""
        import ray.data
        from debezium_incubator_ray.functions.stats import anova_oneway

        ev = ray.data.read_parquet(
            os.path.join(sf_dir, "events.parquet"),
            columns=["event_type", "value"],
        )
        return anova_oneway(ev, "value", "event_type")

    def stats_mutual_info(sf_dir):
        """Mutual information (nats) + Cramer's V between document lang
        and source from ONE contingency fold — the categorical
        association pair a profiler reports together. Exact int64 counts
        inside every log/ratio; per-block partials are bounded by the
        category grid, never the corpus."""
        import ray.data
        from debezium_incubator_ray.functions.stats import (
            mutual_information,
        )

        docs = ray.data.read_parquet(
            os.path.join(sf_dir, "documents.parquet"),
            columns=["lang", "source"],
        )
        return mutual_information(docs, "lang", "source")

    def events_peak_concurrency(sf_dir):
        """Max simultaneously-open sessions (30-min gap sessionization,
        closed intervals) via a two-phase parallel sweep: per-day local
        sweeps report (total_delta, max_prefix); the driver folds O(days)
        rows — never a global ordered scan."""
        import ray.data
        from debezium_incubator_ray.functions.windows import (
            peak_concurrency,
        )

        ev = ray.data.read_parquet(
            os.path.join(sf_dir, "events.parquet"),
            columns=["user_id", "ts", "value"],
        )
        return peak_concurrency(ev)

    def events_time_in_state(sf_dir):
        """Time-weighted state occupancy: each inter-event interval is
        attributed to the earlier event's type; the final open interval
        censors at the observation end. Totals are EXACT int64
        microsecond sums (one float division at the end), so the SQL
        oracle matches to the digit."""
        import ray.data
        from debezium_incubator_ray.functions.windows import time_in_state

        ev = ray.data.read_parquet(
            os.path.join(sf_dir, "events.parquet"),
            columns=["user_id", "ts", "event_type", "event_id"],
        )
        return time_in_state(ev, "user_id", "ts", "event_type",
                             "event_id")

    def orders_rfm_segments(sf_dir):
        """RFM segmentation: quartile codes on recency/frequency/monetary
        per customer (exact quantile_cont thresholds via the shared
        bucket-histogram machinery — no sort), folded to the <=64-cell
        segment histogram with average spend."""
        import ray.data
        from debezium_incubator_ray.functions.windows import rfm_segments

        orders = ray.data.read_parquet(
            os.path.join(sf_dir, "orders.parquet"),
            columns=["o_custkey", "o_orderdate", "o_totalprice"],
        )
        return rfm_segments(orders)

    def approx_distinct_hll(sf_dir):
        """HyperLogLog distinct users (m=256 registers over the md5
        bridge hash, linear-counting small-range correction) —
        deterministic registers, so the SQL oracle recomputes the
        IDENTICAL sketch via length(bin(w)). Complements the KMV
        estimator: HLL merges by elementwise max (unions across
        shards/epochs for free)."""
        import ray.data
        from debezium_incubator_ray.functions.sketch import (
            approx_distinct_hll as hll,
        )

        ev = ray.data.read_parquet(
            os.path.join(sf_dir, "events.parquet"), columns=["user_id"],
        )
        return hll(ev, "user_id", p=8)

    def orders_cohort_ltv(sf_dir):
        """Cohort lifetime-value curve: customers cohorted by first-order
        month; per (cohort, age) revenue plus cumulative revenue per
        customer. One bucketed shuffle of (customer, month, revenue)
        partials; cohort sizes ride the same stream as age=-1 marker
        rows; the driver finish is months^2-bounded."""
        import ray.data
        from debezium_incubator_ray.functions.windows import cohort_ltv

        orders = ray.data.read_parquet(
            os.path.join(sf_dir, "orders.parquet"),
            columns=["o_custkey", "o_orderdate", "o_totalprice"],
        )
        return cohort_ltv(orders)

    def events_survival_km(sf_dir):
        """Kaplan-Meier survival of time-to-second-event per user
        (single-event users right-censored at the observation end) —
        the activation-latency curve. Per-block partials keep each
        user's two smallest (ts, id); durations bucket to hours so the
        driver finish is calendar-bounded, never user-bounded."""
        import ray.data
        from debezium_incubator_ray.functions.stats import (
            kaplan_meier_second_event,
        )

        ev = ray.data.read_parquet(
            os.path.join(sf_dir, "events.parquet"),
            columns=["user_id", "ts", "event_id"],
        )
        return kaplan_meier_second_event(ev, "user_id", "ts", "event_id")

    def stats_theilsen_daily(sf_dir):
        """Theil-Sen robust trend of daily event volume: exact median of
        all pairwise slopes over the calendar-bounded daily series (the
        events fold distributed; the O(days^2) pair set is driver-
        trivial), plus the median-residual intercept."""
        import ray.data
        from debezium_incubator_ray.functions.stats import theil_sen_daily

        ev = ray.data.read_parquet(
            os.path.join(sf_dir, "events.parquet"),
            columns=["ts"],
        )
        return theil_sen_daily(ev, "ts")

    def text_cosine_pairs(sf_dir):
        """Top-50 TF-IDF cosine document pairs via inverted-index
        blocking: only pairs sharing a kept (2 <= df <= 6% of docs) term
        are ever scored — candidate space sum C(df,2), never all-pairs;
        per-term partial dots fold by pair-hash bucket, norms attach by
        hash join. The cutoff is a FRACTION of the corpus so the window
        scales with it."""
        import ray.data
        from debezium_incubator_ray.functions.similarity import (
            cosine_pairs_topk,
        )

        docs = ray.data.read_parquet(
            os.path.join(sf_dir, "documents.parquet"),
            columns=["doc_id", "text"],
        )
        return cosine_pairs_topk(docs, k=50, max_df_frac=0.06, buckets=16)

    def dq_reconcile_orders(sf_dir):
        """Cross-table reconciliation: does each order's stored total
        match the recomputed lineitem charge sum(ext*(1-disc)*(1+tax))?
        Per-order partial sums fold narrow; ONE hash join (orders x
        per-order charges, both large sides bucketed); per-batch
        (n, n_mismatch, max_diff) partials collapse to a single row —
        the classic two-table integrity audit, no row on the driver."""
        import numpy as np
        import pyarrow as pa
        import pyarrow.compute as pc
        import ray.data
        from debezium_incubator_ray.functions.joins import shuffle_join

        orders = ray.data.read_parquet(
            os.path.join(sf_dir, "orders.parquet"),
            columns=["o_orderkey", "o_totalprice"],
        )
        li = ray.data.read_parquet(
            os.path.join(sf_dir, "lineitem.parquet"),
            columns=["l_orderkey", "l_extendedprice", "l_discount",
                     "l_tax"],
        )

        def charge_partial(t: pa.Table) -> pa.Table:
            c = pc.multiply(
                pc.multiply(
                    pc.cast(t["l_extendedprice"], pa.float64()),
                    pc.subtract(
                        1.0, pc.cast(t["l_discount"], pa.float64())
                    ),
                ),
                pc.add(1.0, pc.cast(t["l_tax"], pa.float64())),
            )
            d = pa.table({"l_orderkey": t["l_orderkey"], "c": c})
            g = d.group_by("l_orderkey").aggregate([("c", "sum")])
            return g.rename_columns(["l_orderkey", "c"])

        # ONE shuffle total: per-batch charge partials join orders in
        # their key-hash bucket and the bucket finishes the whole audit
        # in post= — the per-order aggregate, the mismatch test, and the
        # one-row-per-bucket partial all happen where the key is already
        # co-located (a separate groupby + join measured ~2x the time)
        def audit_bucket(j: pa.Table) -> pa.Table:
            g = j.group_by("o_orderkey").aggregate(
                [("c", "sum"), ("o_totalprice", "min")]
            )
            total = pc.cast(g["o_totalprice_min"], pa.float64())
            charge = g["c_sum"]  # NULL when the order had no lineitems
            miss = pc.is_null(charge)
            diff = pc.if_else(
                miss, total, pc.abs(pc.subtract(total, charge))
            )
            mis = pc.or_(miss, pc.greater(diff, 0.01))
            return pa.table({
                "n": pa.array([g.num_rows], pa.int64()),
                "nm": pa.array(
                    [pc.sum(pc.cast(mis, pa.int64())).as_py() or 0],
                    pa.int64(),
                ),
                "mx": pa.array(
                    [pc.max(diff).as_py() if g.num_rows else None],
                    pa.float64(),
                ),
            })

        parts = shuffle_join(
            orders,
            li.map_batches(charge_partial, batch_format="pyarrow",
                           zero_copy_batch=True),
            on="o_orderkey", right_on="l_orderkey",
            join_type="left outer", buckets=32, post=audit_bucket,
        ).take_all()  # one row per bucket
        n = sum(r["n"] for r in parts)
        nm = sum(r["nm"] for r in parts)
        mx = max((r["mx"] for r in parts if r["mx"] is not None),
                 default=None)
        return pa.table({
            "n_orders": pa.array([n], pa.int64()),
            "n_mismatch": pa.array([nm], pa.int64()),
            "max_abs_diff": pa.array(
                [round(mx, 6) if mx is not None else None], pa.float64()
            ),
        })

    def events_new_users_daily(sf_dir):
        """New users per day + running total: first-seen day per user is
        ONE narrow Min fold (never the event history co-located); the
        per-day counts are #days rows, cumsum'd on the driver — the
        'daily active vs new' growth curve."""
        import pyarrow as pa
        import pyarrow.compute as pc
        import numpy as np
        import ray.data
        from ray.data.aggregate import Min, Sum

        ev = ray.data.read_parquet(
            os.path.join(sf_dir, "events.parquet"),
            columns=["user_id", "ts"],
        )

        def day_partial(t: pa.Table) -> pa.Table:
            day = pc.strftime(
                pc.floor_temporal(t["ts"].combine_chunks(), unit="day"),
                format="%Y-%m-%d",
            )
            d = pa.table({"user_id": t["user_id"], "day": day})
            g = d.group_by("user_id").aggregate([("day", "min")])
            return g.rename_columns(["user_id", "day"])

        first_day = (
            ev.map_batches(day_partial, batch_format="pyarrow",
                           zero_copy_batch=True)
            .groupby("user_id")
            .aggregate(Min("day", alias_name="day"))
        )

        def count_partial(t: pa.Table) -> pa.Table:
            g = t.group_by("day").aggregate([([], "count_all")])
            return pa.table({
                "day": g["day"],
                "nu": pc.cast(g["count_all"], pa.int64()),
            })

        per_day = (
            first_day.map_batches(count_partial, batch_format="pyarrow")
            .groupby("day")
            .aggregate(Sum("nu", alias_name="nu"))
            .take_all()
        )  # #distinct-days rows: the only driver-side state
        per_day.sort(key=lambda r: r["day"])
        days = [r["day"] for r in per_day]
        nu = np.array([r["nu"] for r in per_day], dtype=np.int64)
        return pa.table({
            "day": pa.array(days, pa.string()),
            "new_users": pa.array(nu),
            "cum_users": pa.array(np.cumsum(nu)),
        })

    def part_pareto_front(sf_dir):
        """Skyline of parts maximizing (size, retailprice): equi-width
        x-buckets give cross-bucket dominance from B driver floats; a
        cheap pre-filter drops nearly every row before the one bucketed
        shuffle; in-bucket exact front is one vectorized pass — never an
        all-pairs check."""
        import ray.data
        from debezium_incubator_ray.functions.quality import pareto_front

        part = ray.data.read_parquet(
            os.path.join(sf_dir, "part.parquet"),
            columns=["p_partkey", "p_size", "p_retailprice"],
        )
        return pareto_front(part, "p_size", "p_retailprice", n_buckets=64)

    def text_pmi_topk(sf_dir):
        """Top-50 collocations by pointwise mutual information (bigrams
        with count >= 5): full bigram counts fold by pair-hash bucket,
        unigram marginals attach via hash joins, PMI evaluated in the
        oracle's exact operation order."""
        import ray.data
        from debezium_incubator_ray.functions.text import pmi_topk

        docs = ray.data.read_parquet(
            os.path.join(sf_dir, "documents.parquet"), columns=["text"],
        )
        return pmi_topk(docs, k=50, min_count=5, buckets=16)

    def events_longest_streak(sf_dir):
        """Longest consecutive-active-days run per user (gaps-and-
        islands): per-batch distinct (user, day) combiner, one bounded
        hash-bucket shuffle, vectorized anchor-run resolution."""
        import ray.data
        from debezium_incubator_ray.functions.windows import longest_streak

        ev = ray.data.read_parquet(
            os.path.join(sf_dir, "events.parquet"),
            columns=["user_id", "ts"],
        )
        return longest_streak(ev, "user_id", "ts")

    def events_type_overlap(sf_dir):
        """Exact user-overlap Jaccard between every pair of event types:
        distinct (user, type) combiner, per-user pair expansion inside
        bounded hash buckets (kernels.expand_pairs — the co-occurrence
        pattern), tiny pair fold + per-type distinct counts; Jaccard =
        both / (a + b - both)."""
        import numpy as np
        import pyarrow as pa
        import pyarrow.compute as pc
        import ray.data
        from ray.data.aggregate import Sum
        from debezium_incubator_ray.hashing import partition_ids
        from debezium_incubator_ray.functions.kernels import expand_pairs

        ev = ray.data.read_parquet(
            os.path.join(sf_dir, "events.parquet"),
            columns=["user_id", "event_type"],
        )

        def distinct_tagged(t: pa.Table) -> pa.Table:
            d = t.group_by(["user_id", "event_type"]).aggregate([])
            return d.append_column(
                "_b",
                pa.array(partition_ids(d["user_id"].combine_chunks(), 64,
                                       "hash"), pa.int32()),
            )

        def pairs_in_bucket(g: pa.Table) -> pa.Table:
            g = g.drop_columns(["_b"]).group_by(
                ["user_id", "event_type"]
            ).aggregate([])
            u = g["user_id"].combine_chunks().to_numpy(
                zero_copy_only=False
            )
            ty = g["event_type"].combine_chunks()
            order = pc.sort_indices(
                pa.table({"u": pa.array(u), "t": ty}),
                sort_keys=[("u", "ascending"), ("t", "ascending")],
            ).to_numpy(zero_copy_only=False)
            u = u[order]
            ty = pc.take(ty, pa.array(order))
            new_u = np.r_[True, u[1:] != u[:-1]]
            starts = np.flatnonzero(new_u)
            sizes = np.diff(np.append(starts, len(u)))
            L, R = expand_pairs(sizes)
            if len(L) == 0:
                return pa.table({
                    "type_a": pa.array([], pa.string()),
                    "type_b": pa.array([], pa.string()),
                    "n_both": pa.array([], pa.int64()),
                })
            p = pa.table({
                "type_a": pc.take(ty, pa.array(L)),
                "type_b": pc.take(ty, pa.array(R)),
            }).group_by(["type_a", "type_b"]).aggregate([([], "count_all")])
            return pa.table({
                "type_a": p["type_a"],
                "type_b": p["type_b"],
                "n_both": pc.cast(p["count_all"], pa.int64()),
            })

        both = (
            ev.map_batches(distinct_tagged, batch_format="pyarrow",
                           zero_copy_batch=True)
            .groupby("_b")
            .map_groups(pairs_in_bucket, batch_format="pyarrow")
            .groupby(["type_a", "type_b"])
            .aggregate(Sum("n_both", alias_name="n_both"))
            .take_all()
        )  # |types|^2 tiny rows

        # per-type distinct-user counts: per-batch distinct partials are
        # NOT additive for a user spanning batches — fold distinct pairs
        from debezium_incubator_ray.functions.graph import distinct_rows

        cnt_rows = (
            distinct_rows(ev, ["user_id", "event_type"], buckets=64)
            .map_batches(
                lambda t: pa.table({
                    "event_type": t["event_type"],
                    "n": pa.array(
                        np.ones(t.num_rows, dtype=np.int64)
                    ),
                }),
                batch_format="pyarrow",
            )
            .groupby("event_type")
            .aggregate(Sum("n", alias_name="n"))
            .take_all()
        )
        nmap = {r["event_type"]: int(r["n"]) for r in cnt_rows}
        rows = sorted(both, key=lambda r: (r["type_a"], r["type_b"]))
        ta = [r["type_a"] for r in rows]
        tb = [r["type_b"] for r in rows]
        nb = np.array([r["n_both"] for r in rows], dtype=np.int64)
        na = np.array([nmap[a] for a in ta], dtype=np.int64)
        nbb = np.array([nmap[b] for b in tb], dtype=np.int64)
        return pa.table({
            "type_a": pa.array(ta, pa.string()),
            "type_b": pa.array(tb, pa.string()),
            "n_both": pa.array(nb),
            "n_a": pa.array(na),
            "n_b": pa.array(nbb),
            "jaccard": pa.array(
                nb.astype(np.float64) / (na + nbb - nb)
            ),
        })

    def orders_churned_customers(sf_dir):
        """Customers with orders in the first half of the order-date
        range but NONE in the second half: an exact integer-day
        [min, max] probe fixes the midpoint, two distinct-customer folds
        split by it, and ONE distributed anti-join (never a driver-side
        customer set)."""
        import pyarrow as pa
        import pyarrow.compute as pc
        import ray.data
        from ray.data.aggregate import Max, Min

        orders = ray.data.read_parquet(
            os.path.join(sf_dir, "orders.parquet"),
            columns=["o_custkey", "o_orderdate"],
        )

        def days(t: pa.Table) -> pa.Table:
            return pa.table({
                "o_custkey": t["o_custkey"],
                "d": pc.cast(
                    pc.cast(t["o_orderdate"], pa.date32()), pa.int32()
                ),
            })

        stamped = orders.map_batches(days, batch_format="pyarrow",
                                     zero_copy_batch=True)

        # exact integer min/max probe: the midpoint must be the same
        # integer the oracle's date arithmetic produces
        def mm(t: pa.Table) -> pa.Table:
            return pa.table({
                "_k": pa.array([0], pa.int64()),
                "lo": pa.array([pc.min(t["d"]).as_py()], pa.int64()),
                "hi": pa.array([pc.max(t["d"]).as_py()], pa.int64()),
            })

        r = (
            stamped.map_batches(mm, batch_format="pyarrow")
            .groupby("_k")
            .aggregate(Min("lo", alias_name="lo", ignore_nulls=True),
                       Max("hi", alias_name="hi", ignore_nulls=True))
            .take_all()
        )[0]
        lo, hi = int(r["lo"]), int(r["hi"])
        mid = lo + (hi - lo) // 2  # oracle: min + (max - min) // 2 days

        # ONE exchange: per-batch (custkey, any_early, any_late) flag
        # partials fold by customer-hash bucket, and churn is just
        # early & !late on the folded flags — the two distinct sets and
        # the anti-join collapse into one pass
        from debezium_incubator_ray.hashing import partition_ids

        def flag_partial(t: pa.Table) -> pa.Table:
            d = pa.table({
                "o_custkey": t["o_custkey"],
                "e": pc.cast(pc.less(t["d"], mid), pa.int8()),
                "l": pc.cast(pc.greater_equal(t["d"], mid), pa.int8()),
            })
            g = d.group_by("o_custkey").aggregate(
                [("e", "max"), ("l", "max")]
            )
            g = g.rename_columns(["o_custkey", "e", "l"])
            return g.append_column(
                "_b",
                pa.array(partition_ids(g["o_custkey"].combine_chunks(),
                                       16, "hash"), pa.int32()),
            )

        def churned_in_bucket(g: pa.Table) -> pa.Table:
            f = (
                g.drop_columns(["_b"])
                .group_by("o_custkey")
                .aggregate([("e", "max"), ("l", "max")])
            )
            keep = pc.and_(
                pc.equal(f["e_max"], 1), pc.equal(f["l_max"], 0)
            )
            return pa.table({
                "o_custkey": f["o_custkey"].filter(keep),
            })

        return (
            stamped.map_batches(flag_partial, batch_format="pyarrow",
                                zero_copy_batch=True)
            .groupby("_b")
            .map_groups(churned_in_bucket, batch_format="pyarrow")
        )

    def dq_multivariate_outliers(sf_dir):
        """Diagonal-Mahalanobis screen over the four lineitem measures:
        pass 1 folds per-column (n, sum, sumsq) to mean/stddev_samp;
        pass 2 streams d2 = sum(((x - mu) / sd)^2) and collapses to one
        (n_rows, n_outliers, max_d2) row at threshold d2 > 16."""
        import numpy as np
        import pyarrow as pa
        import pyarrow.compute as pc
        import ray.data
        from ray.data.aggregate import Max, Sum

        cols = ["l_quantity", "l_extendedprice", "l_discount", "l_tax"]
        li = ray.data.read_parquet(
            os.path.join(sf_dir, "lineitem.parquet"), columns=cols,
        )

        def mpart(t: pa.Table) -> pa.Table:
            row = {"_k": pa.array([0], pa.int64()),
                   "n": pa.array([t.num_rows], pa.int64())}
            for c in cols:
                x = pc.cast(t[c], pa.float64())
                row[f"{c}_s"] = pa.array([pc.sum(x).as_py() or 0.0])
                row[f"{c}_s2"] = pa.array(
                    [pc.sum(pc.multiply(x, x)).as_py() or 0.0]
                )
            return pa.table(row)

        aggs = [Sum("n", alias_name="n")]
        for c in cols:
            aggs += [Sum(f"{c}_s", alias_name=f"{c}_s"),
                     Sum(f"{c}_s2", alias_name=f"{c}_s2")]
        st = (
            li.map_batches(mpart, batch_format="pyarrow",
                           zero_copy_batch=True)
            .groupby("_k").aggregate(*aggs).take_all()
        )[0]
        n = float(st["n"])
        mu = {c: st[f"{c}_s"] / n for c in cols}
        # stddev_samp: (S2 - n*mu^2) / (n - 1)
        sd = {
            c: float(np.sqrt(
                (st[f"{c}_s2"] - n * mu[c] * mu[c]) / (n - 1.0)
            ))
            for c in cols
        }

        def d2_part(t: pa.Table) -> pa.Table:
            d2 = np.zeros(t.num_rows, dtype=np.float64)
            for c in cols:
                x = pc.cast(t[c], pa.float64()).to_numpy(
                    zero_copy_only=False
                )
                z = (x - mu[c]) / sd[c]
                d2 += z * z
            return pa.table({
                "_k": pa.array([0], pa.int64()),
                "n": pa.array([t.num_rows], pa.int64()),
                "no": pa.array([int((d2 > 16.0).sum())], pa.int64()),
                "mx": pa.array(
                    [float(d2.max()) if len(d2) else None], pa.float64()
                ),
            })

        folded = (
            li.map_batches(d2_part, batch_format="pyarrow",
                           zero_copy_batch=True)
            .groupby("_k")
            .aggregate(Sum("n", alias_name="n"),
                       Sum("no", alias_name="no"),
                       Max("mx", alias_name="mx", ignore_nulls=True))
        )
        return folded.map_batches(
            lambda t: pa.table({
                "n_rows": pc.cast(t["n"], pa.int64()),
                "n_outliers": pc.cast(t["no"], pa.int64()),
                "max_d2": pc.round(t["mx"], ndigits=6),
            }),
            batch_format="pyarrow",
        )

    def orders_backlog_curve(sf_dir):
        """Daily count of 'open' orders (open = within 30 days of
        placement) — the sweep-line / diff-array interval-counting
        pattern: each order contributes +1 at its day and -1 at
        day + 30, per-day deltas fold narrow, and the #days-row running
        sum happens on the driver. Never a per-(order x day) expansion."""
        import numpy as np
        import pyarrow as pa
        import pyarrow.compute as pc
        import ray.data
        from ray.data.aggregate import Sum

        orders = ray.data.read_parquet(
            os.path.join(sf_dir, "orders.parquet"),
            columns=["o_orderdate"],
        )

        def deltas(t: pa.Table) -> pa.Table:
            day = pc.cast(
                pc.cast(t["o_orderdate"], pa.date32()), pa.int32()
            ).to_numpy(zero_copy_only=False).astype(np.int64)
            d = pa.table({
                "day": pa.array(np.concatenate([day, day + 30])),
                "delta": pa.array(np.concatenate([
                    np.ones(len(day), dtype=np.int64),
                    np.full(len(day), -1, dtype=np.int64),
                ])),
            })
            g = d.group_by("day").aggregate([("delta", "sum")])
            return g.rename_columns(["day", "delta"])

        per_day = (
            orders.map_batches(deltas, batch_format="pyarrow",
                               zero_copy_batch=True)
            .groupby("day")
            .aggregate(Sum("delta", alias_name="delta"))
            .take_all()
        )  # #distinct days: the only driver-side state
        per_day.sort(key=lambda r: r["day"])
        days = np.array([r["day"] for r in per_day], dtype=np.int64)
        deltas_a = np.array([r["delta"] for r in per_day], dtype=np.int64)
        day_str = days.astype("datetime64[D]").astype(str)
        return pa.table({
            "day": pa.array(day_str.tolist(), pa.string()),
            "open_orders": pa.array(np.cumsum(deltas_a)),
        })

    def stats_trimmed_means(sf_dir):
        """Per-type 10%-trimmed mean of event values: exact group
        quantiles (groups co-locate — same contract as
        quantiles_per_group), inclusive [p10, p90] filter, mean of the
        kept rows; all in one vectorized kernel per group."""
        import numpy as np
        import pyarrow as pa
        import pyarrow.compute as pc
        import ray.data

        ev = ray.data.read_parquet(
            os.path.join(sf_dir, "events.parquet"),
            columns=["event_type", "value"],
        )

        def f(g: pa.Table) -> pa.Table:
            v = (
                g["value"].combine_chunks().drop_null()
                .to_numpy(zero_copy_only=False).astype(np.float64)
            )
            if len(v) == 0:
                return pa.table({
                    "event_type": pa.array([], g["event_type"].type),
                    "n_kept": pa.array([], pa.int64()),
                    "trimmed_mean": pa.array([], pa.float64()),
                })
            lo, hi = np.quantile(v, [0.1, 0.9], method="linear")
            kept = v[(v >= lo) & (v <= hi)]
            return pa.table({
                "event_type": pa.array([g["event_type"][0].as_py()]),
                "n_kept": pa.array([len(kept)], pa.int64()),
                "trimmed_mean": pa.array([float(kept.mean())],
                                         pa.float64()),
            })

        return ev.groupby("event_type").map_groups(
            f, batch_format="pyarrow"
        )

    def events_imputed_means(sf_dir):
        """NULL imputation with the per-type mean — the standard
        feature-prep step: one narrow (sum, n) fold per type, the tiny
        mean map BROADCASTS via closure, and the fill streams. Output is
        every row with `value_imp` = COALESCE(value, type mean)."""
        import pyarrow as pa
        import pyarrow.compute as pc
        import ray.data
        from ray.data.aggregate import Sum

        ev = ray.data.read_parquet(
            os.path.join(sf_dir, "events.parquet"),
            columns=["event_id", "event_type", "value"],
        )

        def partial(t: pa.Table) -> pa.Table:
            v = pc.cast(t["value"], pa.float64())
            d = pa.table({
                "event_type": t["event_type"],
                "s": pc.fill_null(v, 0.0),
                "n": pc.cast(pc.is_valid(v), pa.int64()),
            })
            g = d.group_by("event_type").aggregate(
                [("s", "sum"), ("n", "sum")]
            )
            return g.rename_columns(["event_type", "s", "n"])

        rows = (
            ev.map_batches(partial, batch_format="pyarrow",
                           zero_copy_batch=True)
            .groupby("event_type")
            .aggregate(Sum("s", alias_name="s"), Sum("n", alias_name="n"))
            .take_all()
        )  # |types| rows
        means = {r["event_type"]: r["s"] / r["n"] for r in rows
                 if r["n"]}
        mt = pa.table({
            "event_type": pa.array(list(means), pa.string()),
            "m": pa.array(list(means.values()), pa.float64()),
        })

        def fill(t: pa.Table) -> pa.Table:
            pos = pc.index_in(t["event_type"], value_set=mt["event_type"])
            m = mt["m"].take(pos)
            v = pc.cast(t["value"], pa.float64())
            return pa.table({
                "event_id": t["event_id"],
                "event_type": t["event_type"],
                "value_imp": pc.if_else(pc.is_valid(v), v, m),
            })

        return ev.map_batches(fill, batch_format="pyarrow",
                              zero_copy_batch=True)

    def events_minmax_scaled(sf_dir):
        """Global min-max feature scaling: the two-float range probe
        rides the task closures and the scaling streams — scaled =
        (v - mn) / (mx - mn), rows with NULL value dropped."""
        import pyarrow as pa
        import pyarrow.compute as pc
        import ray.data
        from debezium_incubator_ray.functions.quality import global_min_max

        ev = ray.data.read_parquet(
            os.path.join(sf_dir, "events.parquet"),
            columns=["event_id", "value"],
        )
        mn, mx = global_min_max(ev, "value")
        span = mx - mn

        def scale(t: pa.Table) -> pa.Table:
            t = t.filter(pc.is_valid(t["value"]))
            v = pc.cast(t["value"], pa.float64())
            return pa.table({
                "event_id": t["event_id"],
                "scaled": pc.divide(pc.subtract(v, mn), span),
            })

        return ev.map_batches(scale, batch_format="pyarrow",
                              zero_copy_batch=True)

    def orders_decile_report(sf_dir):
        """Decile analysis of order value: global NTILE(10) over
        (o_totalprice, o_orderkey) via the bucket-cumsum rank — no
        global sort — then one narrow per-tile fold of (n, sum, min,
        max)."""
        import numpy as np
        import pyarrow as pa
        import pyarrow.compute as pc
        import ray.data
        from ray.data.aggregate import Max, Min, Sum
        from debezium_incubator_ray.functions.rank import global_ntile

        orders = ray.data.read_parquet(
            os.path.join(sf_dir, "orders.parquet"),
            columns=["o_orderkey", "o_totalprice"],
        )
        tiled = global_ntile(orders, "o_totalprice", "o_orderkey", k=10)

        def partial(t: pa.Table) -> pa.Table:
            d = pa.table({
                "tile": t["tile"],
                "s": pc.cast(t["o_totalprice"], pa.float64()),
                "n": pa.array(np.ones(t.num_rows, dtype=np.int64)),
            })
            g = d.group_by("tile").aggregate(
                [("s", "sum"), ("s", "min"), ("s", "max"), ("n", "sum")]
            )
            return g.rename_columns(["tile", "s", "mn", "mx", "n"])

        folded = (
            tiled.map_batches(partial, batch_format="pyarrow")
            .groupby("tile")
            .aggregate(Sum("s", alias_name="s"),
                       Min("mn", alias_name="mn"),
                       Max("mx", alias_name="mx"),
                       Sum("n", alias_name="n"))
        )
        return folded.map_batches(
            lambda t: pa.table({
                "tile": t["tile"],
                "n": pc.cast(t["n"], pa.int64()),
                "total": pc.round(t["s"], ndigits=3),
                "lo": t["mn"],
                "hi": t["mx"],
            }),
            batch_format="pyarrow",
        )

    def stats_ntile(sf_dir):
        """Global ROW_NUMBER + NTILE(8) over (o_totalprice, o_orderkey)
        without a global sort — the bucket-cumsum rank plus the SQL
        tile-fill rule applied in closed form per row."""
        import ray.data
        from debezium_incubator_ray.functions.rank import global_ntile

        orders = ray.data.read_parquet(
            os.path.join(sf_dir, "orders.parquet"),
            columns=["o_orderkey", "o_totalprice"],
        )
        return global_ntile(orders, "o_totalprice", "o_orderkey", k=8)

    def stats_global_quantiles(sf_dir):
        """Exact interpolated quantiles of the event value column
        without sorting or collecting it: the bucket histogram pinpoints
        the buckets holding each target order statistic and ONLY those
        buckets' rows (O(n/B)) are pulled and sorted."""
        import ray.data
        from debezium_incubator_ray.functions.rank import (
            global_quantile_cont,
        )

        ev = ray.data.read_parquet(
            os.path.join(sf_dir, "events.parquet"), columns=["value"],
        )
        return global_quantile_cont(
            ev, "value", [0.1, 0.25, 0.5, 0.75, 0.9, 0.99]
        )

    def stats_winsorized_means(sf_dir):
        """Per-type mean of values winsorized at the global [p05, p95]:
        the distributed quantile probe feeds two floats into a streaming
        clip + per-batch partial-sum fold — outlier-robust aggregation
        as one composition, no sort, no row ever on the driver."""
        import pyarrow as pa
        import pyarrow.compute as pc
        import numpy as np
        import ray.data
        from ray.data.aggregate import Sum
        from debezium_incubator_ray.functions.rank import (
            global_quantile_cont,
        )

        ev = ray.data.read_parquet(
            os.path.join(sf_dir, "events.parquet"),
            columns=["event_type", "value"],
        )
        qt = global_quantile_cont(ev, "value", [0.05, 0.95])
        lo, hi = qt["value"][0].as_py(), qt["value"][1].as_py()

        def partial(t: pa.Table) -> pa.Table:
            t = t.filter(pc.is_valid(t["value"]))
            v = pc.min_element_wise(
                pc.max_element_wise(
                    pc.cast(t["value"], pa.float64()), lo
                ),
                hi,
            )
            d = pa.table({
                "event_type": t["event_type"],
                "s": v,
                "n": pa.array(np.ones(t.num_rows, dtype=np.int64)),
            })
            g = d.group_by("event_type").aggregate(
                [("s", "sum"), ("n", "sum")]
            )
            return g.rename_columns(["event_type", "s", "n"])

        folded = (
            ev.map_batches(partial, batch_format="pyarrow",
                           zero_copy_batch=True)
            .groupby("event_type")
            .aggregate(Sum("s", alias_name="s"), Sum("n", alias_name="n"))
        )
        return folded.map_batches(
            lambda t: pa.table({
                "event_type": t["event_type"],
                "n": pc.cast(t["n"], pa.int64()),
                "wmean": pc.divide(t["s"], pc.cast(t["n"], pa.float64())),
            }),
            batch_format="pyarrow",
        )

    def join_small_qty_revenue(sf_dir):
        """TPC-H Q17 shape (per-group average needed BEFORE the row
        filter): per brand, avg yearly revenue of lineitems with
        quantity below 20% of their part's average. Two streamed passes
        over the fact — per-part (sum, cnt) folds narrow and broadcasts
        with the brand dim attached; the filter compares
        5*qty*cnt < sum_qty EXACTLY (integral doubles), so no
        avg-rounding ambiguity vs the oracle. The fact never shuffles."""
        import pyarrow.parquet as _pq
        import ray.data
        from debezium_incubator_ray.functions.joins import (
            small_qty_brand_revenue,
        )

        li = ray.data.read_parquet(
            os.path.join(sf_dir, "lineitem.parquet"),
            columns=["l_partkey", "l_quantity", "l_extendedprice"],
        )
        part = _pq.read_table(
            os.path.join(sf_dir, "part.parquet"),
            columns=["p_partkey", "p_brand"],
        )
        return small_qty_brand_revenue(li, part)

    def join_large_qty_orders(sf_dir):
        """TPC-H Q18 shape (HAVING on a grouped sum, join-back to the
        parents): top-100 orders by total lineitem quantity > 200, with
        order + customer attributes. Per-order sums fold from per-block
        partials; only HAVING survivors broadcast; orders streams once
        with an in-place semi-filter + dimension join — no fact-sized
        shuffle. sum_qty is an exact integral double, so the threshold
        and the (sum_qty desc, orderkey) tie-break match SQL exactly."""
        import pyarrow.parquet as _pq
        import ray.data
        from debezium_incubator_ray.functions.joins import large_qty_orders

        li = ray.data.read_parquet(
            os.path.join(sf_dir, "lineitem.parquet"),
            columns=["l_orderkey", "l_quantity"],
        )
        orders = ray.data.read_parquet(
            os.path.join(sf_dir, "orders.parquet"),
            columns=["o_orderkey", "o_custkey", "o_orderdate",
                     "o_totalprice"],
        )
        cust = _pq.read_table(
            os.path.join(sf_dir, "customer.parquet"),
            columns=["c_custkey", "c_name"],
        )
        return large_qty_orders(li, orders, cust, threshold=200.0, k=100)

    def part_association_rules(sf_dir):
        """Market-basket association rules over the top-200 co-purchased
        part pairs: support / confidence(a->b) / confidence(b->a) /
        lift, top-25 by (lift desc, a, b). Pair counts reuse the
        bucketed copurchase machinery; per-part basket counts fold via
        the distinct-pair combiner; all ratios divide exact int64
        counts so the floats match SQL bit-for-bit."""
        import ray.data
        from debezium_incubator_ray.functions.joins import association_rules

        li = ray.data.read_parquet(
            os.path.join(sf_dir, "lineitem.parquet"),
            columns=["l_orderkey", "l_partkey"],
        )
        return association_rules(li, "l_orderkey", "l_partkey",
                                 k_pairs=200, k=25)

    def graph_adamic_adar(sf_dir):
        """Link prediction on the top-2000 co-purchase subgraph: top-50
        NON-adjacent part pairs by Adamic-Adar score
        (sum of 1/ln(deg(w)) over common neighbors w). Full
        neighborhoods co-locate by center hash (deg = group size, so
        the weight needs no join); canonical edges ride the same pair
        buckets as null-weight markers for the in-bucket anti-join.
        Ties break on the ROUNDED score then (a, b), mirrored by the
        oracle."""
        import pyarrow as pa
        import ray.data
        from debezium_incubator_ray.functions.joins import copurchase_pairs
        from debezium_incubator_ray.functions.graph import adamic_adar

        li = ray.data.read_parquet(
            os.path.join(sf_dir, "lineitem.parquet"),
            columns=["l_orderkey", "l_partkey"],
        )
        top = copurchase_pairs(li, "l_orderkey", "l_partkey", k=2000)
        edges = ray.data.from_arrow(pa.table({
            "src": top["l_partkey_a"], "dst": top["l_partkey_b"],
        }))
        return adamic_adar(edges, k=50, buckets=32)

    def events_daily_ohlc(sf_dir):
        """Daily OHLC bars of the event value stream: open/close = value
        at the min/max (ts, event_id) per calendar day (SQL
        arg_min/arg_max), plus low/high/n — the canonical time-series
        downsample. Each block folds to at most one partial row per day
        (an associative fold), so the one groupby moves O(days x
        blocks) tiny rows."""
        import ray.data
        from debezium_incubator_ray.functions.windows import daily_ohlc

        ev = ray.data.read_parquet(
            os.path.join(sf_dir, "events.parquet"),
            columns=["ts", "event_id", "value"],
        )
        return daily_ohlc(ev)

    def dq_candidate_keys(sf_dir):
        """Candidate-key discovery on events: per column, the exact
        distinct count (NULLs excluded), uniqueness ratio and is_key
        verdict. Each column streams its OWN column-pruned parquet
        read; per-block distinct combiners bound the shuffle at
        |distinct| per block and only int64 partials reach the
        driver."""
        import ray.data
        from debezium_incubator_ray.functions.quality import candidate_keys

        def ds_for(col):
            return ray.data.read_parquet(
                os.path.join(sf_dir, "events.parquet"), columns=[col]
            )

        return candidate_keys(
            ds_for, ["event_id", "user_id", "event_type", "props"],
            buckets=32,
        )

    def text_heaps_law(sf_dir):
        """Heaps'-law vocabulary growth per corpus source: total tokens N,
        exact distinct tokens V, and the global log-log fit V = k*N^beta
        (regr_slope/intercept over ln N, ln V). Token totals fold as
        per-block sums; vocabulary dedupes per block then shuffles ONCE
        by token hash; only O(sources) rows reach the driver fit."""
        import ray.data
        from debezium_incubator_ray.functions.text import heaps_law

        docs = ray.data.read_parquet(
            os.path.join(sf_dir, "documents.parquet"),
            columns=["source", "text"],
        )
        return heaps_law(docs, buckets=32)

    def orders_late_ship(sf_dir):
        """TPC-H Q4 shape (EXISTS semi-join on a derived condition): per
        order priority, how many orders have at least one lineitem
        shipped more than 60 days after the order date. One bucketed
        shuffle co-locates each order's lineitems with its order row;
        the distinct-order count finishes in-bucket (the bucket owns the
        whole key), so only per-priority partials leave."""
        import pyarrow as pa
        import pyarrow.compute as pc
        import ray.data
        from ray.data.aggregate import Sum
        from debezium_incubator_ray.functions.joins import shuffle_join

        li = ray.data.read_parquet(
            os.path.join(sf_dir, "lineitem.parquet"),
            columns=["l_orderkey", "l_shipdate"],
        )
        orders = ray.data.read_parquet(
            os.path.join(sf_dir, "orders.parquet"),
            columns=["o_orderkey", "o_orderdate", "o_orderpriority"],
        )
        sixty_days = pa.scalar(60 * 86400 * 1_000_000, pa.duration("us"))

        def post(j: pa.Table) -> pa.Table:
            late = pc.greater(
                j["l_shipdate"], pc.add(j["o_orderdate"], sixty_days)
            )
            d = (
                j.filter(late)
                .select(["l_orderkey", "o_orderpriority"])
                .group_by(["l_orderkey", "o_orderpriority"])
                .aggregate([])
            )
            g = d.group_by("o_orderpriority").aggregate([([], "count_all")])
            return pa.table({
                "o_orderpriority": g["o_orderpriority"],
                "n": pc.cast(g["count_all"], pa.int64()),
            })

        joined = shuffle_join(
            li, orders, on="l_orderkey", right_on="o_orderkey",
            buckets=32, post=post,
        )
        return (
            joined.groupby("o_orderpriority")
            .aggregate(Sum("n", alias_name="n_late_orders"))
        )

    def graph_kcore(sf_dir):
        """Bounded k-core peeling (k=3, 4 rounds) of the top-2000
        co-purchase subgraph: each round drops nodes of degree < 3 and
        the edges touching them — one degree fold + one broadcast
        semi-filter per round, the distributed core-decomposition step.
        Survivors report their degree inside the final edge set; the
        oracle unrolls the same 4 rounds."""
        import pyarrow as pa
        import ray.data
        from debezium_incubator_ray.functions.joins import copurchase_pairs
        from debezium_incubator_ray.functions.graph import kcore_peel

        li = ray.data.read_parquet(
            os.path.join(sf_dir, "lineitem.parquet"),
            columns=["l_orderkey", "l_partkey"],
        )
        top = copurchase_pairs(li, "l_orderkey", "l_partkey", k=2000)
        edges = ray.data.from_arrow(pa.table({
            "src": top["l_partkey_a"], "dst": top["l_partkey_b"],
        }))
        return kcore_peel(edges, k=3, rounds=4, buckets=32)

    def stats_brown_forsythe(sf_dir):
        """Brown-Forsythe variance-homogeneity F across event types: ANOVA
        on |value - group median| (the robust Levene variant). Medians
        broadcast once (rounded to the shared 6-dp contract so both sides
        transform identical deviations); the ANOVA fold reuses the
        mean-square-conditioned power sums."""
        import ray.data
        from debezium_incubator_ray.functions.stats import brown_forsythe

        ev = ray.data.read_parquet(
            os.path.join(sf_dir, "events.parquet"),
            columns=["event_type", "value"],
        )
        return brown_forsythe(ev, "value", "event_type")

    def orders_ship_lag_quantiles(sf_dir):
        """Fulfillment-latency SLA report: per order priority, the exact
        p50/p90/p99 of days from order date to FIRST shipment. Per-order
        min shipdate folds from per-block partials; the bucketed shuffle
        join attaches the order row and derives the lag in-bucket; the
        per-priority quantile sorts each (small) group once."""
        import pyarrow as pa
        import pyarrow.compute as pc
        import ray.data
        from debezium_incubator_ray.functions.joins import shuffle_join
        from debezium_incubator_ray.functions.windows import (
            quantiles_per_group,
        )

        li = ray.data.read_parquet(
            os.path.join(sf_dir, "lineitem.parquet"),
            columns=["l_orderkey", "l_shipdate"],
        )
        orders = ray.data.read_parquet(
            os.path.join(sf_dir, "orders.parquet"),
            columns=["o_orderkey", "o_orderdate", "o_orderpriority"],
        )

        def lag(j: pa.Table) -> pa.Table:
            # the bucket co-locates ALL of an order's lineitems with its
            # order row, so the per-order min folds IN-BUCKET — one
            # shuffle total instead of a groupby shuffle + a join shuffle
            g = j.group_by(
                ["l_orderkey", "o_orderpriority", "o_orderdate"]
            ).aggregate([("l_shipdate", "min")])
            fsu = pc.cast(
                pc.cast(g["l_shipdate_min"], pa.timestamp("us")),
                pa.int64(),
            )
            odu = pc.cast(
                pc.cast(g["o_orderdate"], pa.timestamp("us")), pa.int64()
            )
            d = pc.divide(
                pc.cast(pc.subtract(fsu, odu), pa.float64()),
                pa.scalar(86400000000.0),
            )
            return pa.table({
                "o_orderpriority": g["o_orderpriority"], "lag_days": d,
            })

        joined = shuffle_join(
            li, orders, on="l_orderkey", right_on="o_orderkey",
            buckets=32, post=lag,
        )
        return quantiles_per_group(
            joined, group_col="o_orderpriority", value_col="lag_days",
            qs=(0.5, 0.9, 0.99),
        )

    def graph_label_prop(sf_dir):
        """Community detection by bounded synchronous label propagation
        (3 rounds) on the top-2000 co-purchase subgraph: each node adopts
        the most frequent neighbor label (ties: smallest). Adjacency stays
        distributed; per round one broadcast label translation + one
        narrow vote groupby; the oracle unrolls the same rounds."""
        import pyarrow as pa
        import ray.data
        from debezium_incubator_ray.functions.joins import copurchase_pairs
        from debezium_incubator_ray.functions.graph import label_propagation

        li = ray.data.read_parquet(
            os.path.join(sf_dir, "lineitem.parquet"),
            columns=["l_orderkey", "l_partkey"],
        )
        top = copurchase_pairs(li, "l_orderkey", "l_partkey", k=2000)
        edges = ray.data.from_arrow(pa.table({
            "src": top["l_partkey_a"], "dst": top["l_partkey_b"],
        }))
        return label_propagation(edges, rounds=3, buckets=32)

    def events_seasonal_backtest(sf_dir):
        """Seasonal-naive forecast backtest: predict each day's total
        value as the total 7 days earlier and score MAE/RMSE/sMAPE over
        the days with both sides — the baseline every forecaster must
        beat. Per-block day-sum partials, one narrow day groupby, O(days)
        driver finish."""
        import ray.data
        from debezium_incubator_ray.functions.stats import (
            seasonal_naive_backtest,
        )

        ev = ray.data.read_parquet(
            os.path.join(sf_dir, "events.parquet"), columns=["ts", "value"],
        )
        return seasonal_naive_backtest(ev, "ts", "value", season=7)

    def graph_rich_club(sf_dir):
        """Rich-club coefficient of the top-2000 co-purchase subgraph at
        k=10: edge density among nodes of degree > 10 — do the hubs form
        their own clique-ish club? Degree fold + broadcast rich-node
        filter + one count; no pair expansion anywhere."""
        import pyarrow as pa
        import pyarrow.compute as pc
        import ray.data
        from ray.data.aggregate import Sum
        from debezium_incubator_ray.functions.joins import copurchase_pairs
        from debezium_incubator_ray.functions.graph import canonical_edges
        from debezium_incubator_ray.functions.kernels import collect_table

        li = ray.data.read_parquet(
            os.path.join(sf_dir, "lineitem.parquet"),
            columns=["l_orderkey", "l_partkey"],
        )
        top = copurchase_pairs(li, "l_orderkey", "l_partkey", k=2000)
        edges = ray.data.from_arrow(pa.table({
            "src": top["l_partkey_a"], "dst": top["l_partkey_b"],
        }))
        ce = canonical_edges(edges, "src", "dst", buckets=32)

        def deg_partial(t: pa.Table) -> pa.Table:
            nodes = pa.chunked_array(
                [t["a"].combine_chunks(), t["b"].combine_chunks()]
            )
            g = pa.table({"node": nodes}).group_by("node").aggregate(
                [([], "count_all")]
            )
            return pa.table({
                "node": g["node"],
                "d": pc.cast(g["count_all"], pa.int64()),
            })

        deg = collect_table(
            ce.map_batches(deg_partial, batch_format="pyarrow",
                           zero_copy_batch=True)
            .groupby("node").aggregate(Sum("d", alias_name="deg"))
        )
        K = 10
        rich = deg.filter(pc.greater(deg["deg"], pa.scalar(K)))["node"]
        rich = rich.combine_chunks()
        n_rich = len(rich)
        import ray as _ray

        ref = _ray.put(rich)

        def rich_edges(t: pa.Table) -> pa.Table:
            rn = _ray.get(ref)
            keep = pc.and_(
                pc.is_in(t["a"], value_set=rn),
                pc.is_in(t["b"], value_set=rn),
            )
            return pa.table({
                "e": pa.array([int(pc.sum(pc.cast(keep, pa.int64()))
                               .as_py() or 0)], pa.int64()),
            })

        e_rich = int(
            ce.map_batches(rich_edges, batch_format="pyarrow",
                           zero_copy_batch=True).sum("e") or 0
        )
        possible = n_rich * (n_rich - 1) // 2
        phi = round(e_rich / possible, 6) if possible else None
        return pa.table({
            "k": pa.array([K], pa.int64()),
            "n_rich": pa.array([n_rich], pa.int64()),
            "e_rich": pa.array([e_rich], pa.int64()),
            "phi": pa.array([phi], pa.float64()),
        })

    def part_brand_hhi(sf_dir):
        """Market-concentration screen: per part type, the Herfindahl
        index of brand revenue shares (sum of squared shares; 1.0 =
        monopoly) plus the brand count. The part dimension broadcasts
        once; lineitem streams with per-block (type, brand) revenue
        partials; one narrow groupby folds, and the per-type finish runs
        over O(types x brands) rows."""
        import pyarrow as pa
        import pyarrow.compute as pc
        import pyarrow.parquet as _pq
        import ray.data
        from ray.data.aggregate import Sum

        li = ray.data.read_parquet(
            os.path.join(sf_dir, "lineitem.parquet"),
            columns=["l_partkey", "l_extendedprice"],
        )
        part = _pq.read_table(
            os.path.join(sf_dir, "part.parquet"),
            columns=["p_partkey", "p_type", "p_brand"],
        )
        import ray as _ray

        ref = _ray.put(part)

        def partial(t: pa.Table) -> pa.Table:
            d = _ray.get(ref)
            j = t.join(d, keys=["l_partkey"], right_keys=["p_partkey"],
                       join_type="inner")
            g = j.group_by(["p_type", "p_brand"]).aggregate(
                [("l_extendedprice", "sum")]
            )
            return g.rename_columns(["p_type", "p_brand", "rev"])

        folded = (
            li.map_batches(partial, batch_format="pyarrow",
                           zero_copy_batch=True)
            .groupby(["p_type", "p_brand"])
            .aggregate(Sum("rev", alias_name="rev"))
        )

        def finish(g: pa.Table) -> pa.Table:
            import numpy as np

            rev = g["rev"].combine_chunks().to_numpy(zero_copy_only=False)
            share = rev / rev.sum()
            return pa.table({
                "p_type": g["p_type"].slice(0, 1),
                "n_brands": pa.array([g.num_rows], pa.int64()),
                "hhi": pa.array(
                    [round(float(np.sum(share * share)), 6)], pa.float64()
                ),
            })

        return folded.groupby("p_type").map_groups(
            finish, batch_format="pyarrow"
        )

    def text_source_vocab_overlap(sf_dir):
        """Pairwise vocabulary Jaccard between sources (top-50 by rounded
        jaccard, ties (a, b)) — the corpus-similarity gauge behind
        mixture design. Distinct (token, source) combiner per block, one
        token-hash bucketed co-occurrence shuffle, O(sources^2) driver
        rows."""
        import ray.data
        from debezium_incubator_ray.functions.text import (
            source_vocab_overlap,
        )

        docs = ray.data.read_parquet(
            os.path.join(sf_dir, "documents.parquet"),
            columns=["source", "text"],
        )
        return source_vocab_overlap(docs, k=50)

    def docs_length_lognormal(sf_dir):
        """Per-source lognormal fit of document lengths (mu/sigma of
        ln(n_chars) + fitted median) — the length model behind chunking
        and batch-size policy. Shared power-sum fold; conditioned sigma
        so the floats sit far inside the 6-dp gate."""
        import ray.data
        from debezium_incubator_ray.functions.stats import lognormal_fit

        docs = ray.data.read_parquet(
            os.path.join(sf_dir, "documents.parquet"),
            columns=["source", "n_chars"],
        )
        return lognormal_fit(docs, "source", "n_chars")

    def events_dow_seasonality(sf_dir):
        """Day-of-week seasonality index: mean daily value-total per
        weekday divided by the overall daily mean (1.0 = flat) — the
        multiplicative profile a seasonal forecaster factors out. Daily
        sums fold narrow; the 7-row finish runs on the driver."""
        import pyarrow as pa
        import ray.data
        from debezium_incubator_ray.functions.stats import _daily_value_sums

        ev = ray.data.read_parquet(
            os.path.join(sf_dir, "events.parquet"), columns=["ts", "value"],
        )
        days, vals = _daily_value_sums(ev, "ts", "value")
        import numpy as np

        # proleptic ordinal day 1 (0001-01-01) was a Monday → ISO dow
        dow = (days - 1) % 7 + 1
        overall = float(np.mean(vals))
        out = {"dow": [], "n_days": [], "mean_total": [], "index": []}
        for d in range(1, 8):
            m = dow == d
            if not m.any():
                continue
            mt = float(np.mean(vals[m]))
            out["dow"].append(d)
            out["n_days"].append(int(m.sum()))
            out["mean_total"].append(round(mt, 6))
            out["index"].append(round(mt / overall, 6))
        return pa.table({
            "dow": pa.array(out["dow"], pa.int64()),
            "n_days": pa.array(out["n_days"], pa.int64()),
            "mean_total": pa.array(out["mean_total"], pa.float64()),
            "seasonality_index": pa.array(out["index"], pa.float64()),
        })

    def events_markov_stationary(sf_dir):
        """Stationary distribution of the behavioral Markov chain: 8
        power-iteration rounds v' = v*P from uniform over the
        row-normalized transition matrix. The distributed work is the
        transition fold; the |types|^2 matrix iterates on the driver and
        the oracle unrolls the same rounds."""
        import ray.data
        from debezium_incubator_ray.functions.windows import (
            markov_stationary,
        )

        ev = ray.data.read_parquet(
            os.path.join(sf_dir, "events.parquet"),
            columns=["user_id", "event_type", "event_id"],
        )
        return markov_stationary(ev, rounds=8)

    def part_abc_classes(sf_dir):
        """ABC (Pareto) inventory classification: parts ranked by revenue
        in (rev desc, partkey) order; class A covers the first 80% of
        cumulative revenue, B to 95%, C the rest — computed WITHOUT a
        global sort (bucket suffix sums + in-bucket descending prefix,
        the percent_rank discipline in reverse)."""
        import pyarrow as pa
        import ray.data
        from ray.data.aggregate import Sum
        from debezium_incubator_ray.functions.rank import abc_classes

        li = ray.data.read_parquet(
            os.path.join(sf_dir, "lineitem.parquet"),
            columns=["l_partkey", "l_extendedprice"],
        )

        def partial(t: pa.Table) -> pa.Table:
            g = t.group_by("l_partkey").aggregate(
                [("l_extendedprice", "sum")]
            )
            return g.rename_columns(["l_partkey", "rev"])

        kv = (
            li.map_batches(partial, batch_format="pyarrow",
                           zero_copy_batch=True)
            .groupby("l_partkey")
            .aggregate(Sum("rev", alias_name="rev"))
        )
        return abc_classes(kv, "l_partkey", "rev")

    def stats_hill_tail(sf_dir):
        """Hill power-law tail index of per-user activity counts (alpha =
        1 + k / sum ln(n/xmin) over users with >= 20 events) — the
        heavy-tail gauge behind salting and hot-key policy. Counts fold
        narrow; only (k, sum_ln) partials reach the driver."""
        import ray.data
        from debezium_incubator_ray.functions.stats import hill_tail_index

        ev = ray.data.read_parquet(
            os.path.join(sf_dir, "events.parquet"), columns=["user_id"],
        )
        return hill_tail_index(ev, "user_id", xmin=20)

    def stats_runs_test(sf_dir):
        """Wald-Wolfowitz runs test on the signs of day-over-day changes
        of the daily value-sum series — direction randomness vs
        trending/mean-reversion. Exact integer run counts; z from the
        standard two-category moments."""
        import ray.data
        from debezium_incubator_ray.functions.stats import runs_test_daily

        ev = ray.data.read_parquet(
            os.path.join(sf_dir, "events.parquet"), columns=["ts", "value"],
        )
        return runs_test_daily(ev, "ts", "value")

    def events_rolling_median(sf_dir):
        """Trailing-7-day exact median of the value stream per event day
        (the rolling-median monitoring series): quantiles can't
        pre-aggregate, so each 8-byte value replicates into its <= 7
        windows and ONE groupby co-locates each window; phantom windows
        (anchor day without events) emit nothing."""
        import ray.data
        from debezium_incubator_ray.functions.windows import (
            rolling_window_quantile,
        )

        ev = ray.data.read_parquet(
            os.path.join(sf_dir, "events.parquet"),
            columns=["ts", "value"],
        )
        return rolling_window_quantile(
            ev, window_days=7, q=0.5, out_col="med_7d"
        )

    def events_window_dedup(sf_dir):
        """Windowed first-event dedup (alert throttling): per
        (user, event_type, hour) only the FIRST event (by ts, then
        event_id) survives. Reported per event_type: windows, raw
        events, suppressed count, and the SUM of surviving event ids —
        the id sum pins the exact argmin selection, not just counts.
        windows.first_per_window does the heavy lifting: per-batch
        combiner keeps one row per window per batch, windows co-locate
        by user hash, in-bucket resolve is one sort + run-length pass."""
        import numpy as np
        import pyarrow as pa
        import ray.data
        from ray.data.aggregate import Sum
        from debezium_incubator_ray.functions.kernels import collect_table
        from debezium_incubator_ray.functions.windows import (
            first_per_window,
        )

        ev = ray.data.read_parquet(
            os.path.join(sf_dir, "events.parquet"),
            columns=["event_id", "ts", "user_id", "event_type"],
        )

        def add_hour(t: pa.Table) -> pa.Table:
            import pyarrow.compute as pc
            # null ts must drop BEFORE the int cast (a null would turn
            # the numpy view float/NaN and break the floor); the oracle
            # filters ts IS NOT NULL in the same place
            t = t.filter(pc.is_valid(t["ts"]))
            ts = t["ts"].combine_chunks().cast(pa.int64()).to_numpy(
                zero_copy_only=False)
            return t.append_column(
                "h", pa.array(ts // 3_600_000_000, pa.int64())
            )

        kept = first_per_window(
            ev.map_batches(add_hour, batch_format="pyarrow",
                           zero_copy_batch=True),
            ["user_id", "event_type", "h"], ["ts", "event_id"],
        )

        def per_type(t: pa.Table) -> pa.Table:
            g = pa.table({
                "event_type": t["event_type"],
                "n_windows": pa.array(np.ones(t.num_rows, np.int64)),
                "n_events": t["win_n"],
                "kept_id_sum": t["event_id"].combine_chunks().cast(
                    pa.int64()),
            }).group_by(["event_type"]).aggregate(
                [("n_windows", "sum"), ("n_events", "sum"),
                 ("kept_id_sum", "sum")]
            )
            return pa.table({
                "event_type": g["event_type"],
                "n_windows": g["n_windows_sum"],
                "n_events": g["n_events_sum"],
                "kept_id_sum": g["kept_id_sum_sum"],
            })

        agg = (
            kept.map_batches(per_type, batch_format="pyarrow",
                             zero_copy_batch=True)
            .groupby("event_type")
            .aggregate(Sum("n_windows", alias_name="n_windows"),
                       Sum("n_events", alias_name="n_events"),
                       Sum("kept_id_sum", alias_name="kept_id_sum"))
        )
        t = collect_table(agg, empty=pa.table({
            "event_type": pa.array([], pa.string()),
            "n_windows": pa.array([], pa.int64()),
            "n_events": pa.array([], pa.int64()),
            "kept_id_sum": pa.array([], pa.int64()),
        }))
        import pyarrow.compute as pc
        return pa.table({
            "event_type": t["event_type"],
            "n_windows": t["n_windows"],
            "n_events": t["n_events"],
            "n_suppressed": pc.subtract(t["n_events"], t["n_windows"]),
            "kept_id_sum": t["kept_id_sum"],
        })

    def events_decayed_engagement(sf_dir):
        """Exponentially time-decayed engagement per event type (the
        feature-store freshness-weighting primitive): weight =
        2^(-age/7d) anchored at the corpus max timestamp (deterministic
        "now"), folded per batch then through one tiny groupby. The
        decayed sum is irrational, so round(6) on the shared double
        algebra is drift-safe."""
        import numpy as np
        import pyarrow as pa
        import pyarrow.compute as pc
        import ray.data
        from ray.data.aggregate import Sum
        from debezium_incubator_ray.functions.kernels import collect_table

        ev = ray.data.read_parquet(
            os.path.join(sf_dir, "events.parquet"),
            columns=["ts", "event_type"],
        )

        def max_part(t: pa.Table) -> pa.Table:
            ts = t["ts"].combine_chunks().cast(pa.int64())
            ts = ts.drop_null()
            if len(ts) == 0:
                return pa.table({"mt": pa.array([], pa.int64())})
            return pa.table({"mt": pa.array(
                [int(pc.max(ts).as_py())], pa.int64())})

        mt_t = collect_table(
            ev.map_batches(max_part, batch_format="pyarrow",
                           zero_copy_batch=True),
            empty=pa.table({"mt": pa.array([], pa.int64())}),
        )
        if mt_t.num_rows == 0:
            return pa.table({
                "event_type": pa.array([], pa.string()),
                "n": pa.array([], pa.int64()),
                "decayed": pa.array([], pa.float64()),
            })
        MT = int(pc.max(mt_t["mt"]).as_py())

        def part(t: pa.Table) -> pa.Table:
            keep = pc.and_(pc.is_valid(t["ts"]),
                           pc.is_valid(t["event_type"]))
            t = t.filter(keep)
            ts = t["ts"].combine_chunks().cast(pa.int64()).to_numpy(
                zero_copy_only=False)
            age_days = (MT - ts) / 86_400_000_000.0
            w = np.power(2.0, -age_days / 7.0)
            g = pa.table({
                "event_type": t["event_type"],
                "n": pa.array(np.ones(len(ts), np.int64)),
                "decayed": pa.array(w, pa.float64()),
            }).group_by(["event_type"]).aggregate(
                [("n", "sum"), ("decayed", "sum")]
            )
            return pa.table({
                "event_type": g["event_type"],
                "n": g["n_sum"],
                "decayed": g["decayed_sum"],
            })

        agg = (
            ev.map_batches(part, batch_format="pyarrow",
                           zero_copy_batch=True)
            .groupby("event_type")
            .aggregate(Sum("n", alias_name="n"),
                       Sum("decayed", alias_name="decayed"))
        )
        t = collect_table(agg, empty=pa.table({
            "event_type": pa.array([], pa.string()),
            "n": pa.array([], pa.int64()),
            "decayed": pa.array([], pa.float64()),
        }))
        return pa.table({
            "event_type": t["event_type"],
            "n": t["n"],
            "decayed": pc.round(t["decayed"], 6),
        })

    def part_price_volume_bridge(sf_dir):
        """Price-volume bridge (the revenue-change decomposition every
        sales review runs): per brand, 1999→2000 revenue change split
        into a volume effect ((v2-v1) at year-1 average price) and the
        residual price/mix effect. One lineitem pass with the brand map
        broadcast; per-(brand, year) exact integer partials; the driver
        finishes over #brands rows. Effects are exact-integer products
        divided ONCE as doubles — both sides compute the identical
        division, so no rounding step exists to diverge on."""
        import numpy as np
        import pyarrow as pa
        import pyarrow.compute as pc
        import pyarrow.parquet as _pq
        import ray
        import ray.data
        from ray.data.aggregate import Sum
        from debezium_incubator_ray.functions.kernels import (
            collect_table, sorted_lookup,
        )

        LO = np.datetime64("1999-01-01T00:00:00", "us").astype(np.int64)
        HI = np.datetime64("2001-01-01T00:00:00", "us").astype(np.int64)

        pt = _pq.read_table(
            os.path.join(sf_dir, "part.parquet"),
            columns=["p_partkey", "p_brand"],
        )
        pk = pt["p_partkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        o = np.argsort(pk)
        pk_ref = ray.put((pk[o], pt["p_brand"].combine_chunks().take(
            pa.array(o))))

        li = ray.data.read_parquet(
            os.path.join(sf_dir, "lineitem.parquet"),
            columns=["l_partkey", "l_quantity", "l_extendedprice",
                     "l_shipdate"],
        )
        EMPTY = pa.table({
            "p_brand": pa.array([], pa.string()),
            "l_year": pa.array([], pa.int64()),
            "rev_c": pa.array([], pa.int64()),
            "vol_c": pa.array([], pa.int64()),
        })

        def lpart(t: pa.Table) -> pa.Table:
            pkk, brands = ray.get(pk_ref)
            ship = t["l_shipdate"].combine_chunks().cast(
                pa.int64()).to_numpy(zero_copy_only=False)
            t = t.filter(pa.array((ship >= LO) & (ship < HI)))
            if t.num_rows == 0 or len(pkk) == 0:
                return EMPTY
            lp = t["l_partkey"].combine_chunks().to_numpy(
                zero_copy_only=False).astype(np.int64)
            pos, found = sorted_lookup(pkk, lp)
            if not found.any():
                return EMPTY
            t = t.filter(pa.array(found))
            br = brands.take(pa.array(pos[found]))
            ship = t["l_shipdate"].combine_chunks().cast(
                pa.int64()).to_numpy(zero_copy_only=False)
            year = ship.astype("datetime64[us]").astype(
                "datetime64[Y]").astype(np.int64) + 1970
            rev_c = pc.cast(
                pc.round(pc.multiply(t["l_extendedprice"], 100.0)),
                pa.int64()).to_numpy(zero_copy_only=False)
            vol_c = pc.cast(
                pc.round(pc.multiply(t["l_quantity"], 100.0)),
                pa.int64()).to_numpy(zero_copy_only=False)
            g = pa.table({
                "p_brand": br,
                "l_year": pa.array(year),
                "rev_c": pa.array(rev_c),
                "vol_c": pa.array(vol_c),
            }).group_by(["p_brand", "l_year"]).aggregate(
                [("rev_c", "sum"), ("vol_c", "sum")]
            )
            return pa.table({
                "p_brand": g["p_brand"],
                "l_year": g["l_year"],
                "rev_c": g["rev_c_sum"],
                "vol_c": g["vol_c_sum"],
            })

        g = (
            li.map_batches(lpart, batch_format="pyarrow",
                           zero_copy_batch=True)
            .groupby(["p_brand", "l_year"])
            .aggregate(Sum("rev_c", alias_name="rev_c"),
                       Sum("vol_c", alias_name="vol_c"))
        )
        t = collect_table(g, empty=EMPTY)
        acc = {}
        for b, y, r, v in zip(t["p_brand"].to_pylist(),
                              t["l_year"].to_pylist(),
                              t["rev_c"].to_pylist(),
                              t["vol_c"].to_pylist()):
            acc.setdefault(b, {})[int(y)] = (int(r), int(v))
        rows = []
        for b in sorted(acc):
            r1, v1 = acc[b].get(1999, (0, 0))
            r2, v2 = acc[b].get(2000, (0, 0))
            if v1 <= 0:
                continue  # no year-1 base price — oracle HAVING mirrors
            # float() the exact integer product BEFORE dividing — the
            # oracle casts the HUGEINT product to DOUBLE the same way,
            # so both sides round identically even past 2^53
            ve = float((v2 - v1) * r1) / float(v1)
            rows.append((b, r1 / 100.0, r2 / 100.0, ve,
                         float(r2 - r1) - ve))
        return pa.table({
            "p_brand": pa.array([r[0] for r in rows], pa.string()),
            "rev_1999": pa.array([r[1] for r in rows], pa.float64()),
            "rev_2000": pa.array([r[2] for r in rows], pa.float64()),
            "volume_effect_c": pa.array([r[3] for r in rows],
                                        pa.float64()),
            "price_effect_c": pa.array([r[4] for r in rows],
                                       pa.float64()),
        })

    def events_holt_backtest(sf_dir):
        """Holt linear-trend one-step-ahead backtest on the daily value
        sums (stats.holt_backtest): distributed daily fold, O(days)
        recursive finish — the oracle replays the recursion with a
        RECURSIVE CTE using the exact same parenthesization."""
        import ray.data
        from debezium_incubator_ray.functions.stats import holt_backtest

        ev = ray.data.read_parquet(
            os.path.join(sf_dir, "events.parquet"),
            columns=["ts", "value"],
        )
        return holt_backtest(ev, "ts", "value")

    def events_touch_attribution(sf_dir):
        """Linear multi-touch attribution: each purchase's value splits
        EQUALLY across the same user's non-purchase touches in the hour
        before it; per touch type, total attributed value and touch
        count. Exact integer micro shares ((cents * 10^6) // k — the
        truncation is identical on both sides) so no float split can
        drift. One bucketed shuffle on user hash; in-bucket the window
        lookup is a composite-key double searchsorted (user-rank *
        span + ts) — vectorized, no per-conversion loop."""
        import numpy as np
        import pyarrow as pa
        import pyarrow.compute as pc
        import ray.data
        from ray.data.aggregate import Sum
        from debezium_incubator_ray.functions.kernels import collect_table
        from debezium_incubator_ray.hashing import partition_ids

        HOUR = 3_600_000_000
        CONV = "purchase"

        ev = ray.data.read_parquet(
            os.path.join(sf_dir, "events.parquet"),
            columns=["event_id", "ts", "user_id", "event_type", "value"],
        )

        def tag(t: pa.Table) -> pa.Table:
            # null event_type must drop too: the oracle's
            # `event_type <> 'purchase'` is NULL-rejecting, so a null
            # row is neither a touch nor a conversion there
            keep = pc.and_(
                pc.and_(pc.is_valid(t["user_id"]), pc.is_valid(t["ts"])),
                pc.is_valid(t["event_type"]),
            )
            t = t.filter(keep)
            return t.append_column(
                "_b", pa.array(partition_ids(
                    t["user_id"].combine_chunks(), 64, "hash"), pa.int32())
            )

        EMPTY = pa.table({
            "event_type": pa.array([], pa.string()),
            "n_touches": pa.array([], pa.int64()),
            "attributed_micro": pa.array([], pa.int64()),
        })

        def attribute(g: pa.Table) -> pa.Table:
            g = g.drop_columns(["_b"])
            s = g.take(pc.sort_indices(g, sort_keys=[
                ("user_id", "ascending"), ("ts", "ascending"),
                ("event_id", "ascending"),
            ]))
            uid = s["user_id"].combine_chunks().to_numpy(
                zero_copy_only=False).astype(np.int64)
            ts = s["ts"].combine_chunks().cast(pa.int64()).to_numpy(
                zero_copy_only=False)
            et = s["event_type"].combine_chunks()
            is_conv = pc.equal(et, CONV).to_numpy(zero_copy_only=False)
            is_conv = np.asarray(is_conv, bool)
            val = s["value"].combine_chunks().to_numpy(
                zero_copy_only=False)
            if len(uid) == 0:
                return EMPTY
            # composite key: user RANK * span + ts offset (span covers
            # the full ts range, so users never interleave)
            _, urank = np.unique(uid, return_inverse=True)
            t0 = int(ts.min())
            span = int(ts.max()) - t0 + HOUR + 2
            key = urank.astype(np.int64) * span + (ts - t0) + 1
            nk = key[~is_conv]  # touches = non-conversion events, sorted
            conv = is_conv & ~np.isnan(val)
            ck = key[conv]
            cents = np.round(val[conv] * 100.0).astype(np.int64)
            lo = np.searchsorted(nk, ck - HOUR)
            hi = np.searchsorted(nk, ck)  # strictly before the purchase
            k = hi - lo
            hit = k > 0
            if not hit.any():
                return EMPTY
            kh = k[hit]
            total = int(kh.sum())
            share = (cents[hit] * 1_000_000) // kh
            tidx = (np.repeat(lo[hit], kh)
                    + np.arange(total)
                    - np.repeat(np.cumsum(kh) - kh, kh))
            ntypes = et.filter(pa.array(~is_conv)).take(pa.array(tidx))
            gg = pa.table({
                "event_type": ntypes,
                "n_touches": pa.array(np.ones(total, np.int64)),
                "attributed_micro": pa.array(np.repeat(share, kh)),
            }).group_by(["event_type"]).aggregate(
                [("n_touches", "sum"), ("attributed_micro", "sum")]
            )
            return pa.table({
                "event_type": gg["event_type"],
                "n_touches": gg["n_touches_sum"],
                "attributed_micro": gg["attributed_micro_sum"],
            })

        agg = (
            ev.map_batches(tag, batch_format="pyarrow",
                           zero_copy_batch=True)
            .groupby("_b")
            .map_groups(attribute, batch_format="pyarrow")
            .groupby("event_type")
            .aggregate(Sum("n_touches", alias_name="n_touches"),
                       Sum("attributed_micro",
                           alias_name="attributed_micro"))
        )
        return collect_table(agg, empty=EMPTY)

    def orders_duplicate_invoices(sf_dir):
        """Duplicate-invoice screening (band self-join): pairs of orders
        by the SAME customer whose totals land in the same $1000 band,
        with how many days apart they were placed. One bucketed shuffle
        on customer hash; in-bucket the (customer, band) runs expand to
        i<j pairs via the shared ``expand_pairs`` kernel — candidate
        space is sum C(run,2), never orders x orders."""
        import numpy as np
        import pyarrow as pa
        import pyarrow.compute as pc
        import ray.data
        from debezium_incubator_ray.functions.kernels import expand_pairs
        from debezium_incubator_ray.hashing import partition_ids

        orders = ray.data.read_parquet(
            os.path.join(sf_dir, "orders.parquet"),
            columns=["o_orderkey", "o_custkey", "o_totalprice",
                     "o_orderdate"],
        )

        def tag(t: pa.Table) -> pa.Table:
            cents = pc.cast(
                pc.round(pc.multiply(t["o_totalprice"], 100.0)),
                pa.int64()).to_numpy(zero_copy_only=False)
            od = t["o_orderdate"].combine_chunks().cast(
                pa.int64()).to_numpy(zero_copy_only=False)
            ck = t["o_custkey"].combine_chunks()
            return pa.table({
                "_b": pa.array(partition_ids(ck, 64, "hash"), pa.int32()),
                "o_custkey": ck.cast(pa.int64()),
                "o_orderkey": t["o_orderkey"].combine_chunks().cast(
                    pa.int64()),
                "band": pa.array(cents // 100_000),
                "day": pa.array(od // 86_400_000_000),
            })

        def pairs(g: pa.Table) -> pa.Table:
            s = g.take(pc.sort_indices(g, sort_keys=[
                ("o_custkey", "ascending"), ("band", "ascending"),
                ("o_orderkey", "ascending"),
            ]))
            ck = s["o_custkey"].combine_chunks().to_numpy(
                zero_copy_only=False)
            bd = s["band"].combine_chunks().to_numpy(zero_copy_only=False)
            n = len(ck)
            first = np.zeros(n, bool)
            if n:
                first[0] = True
                first[1:] = (ck[1:] != ck[:-1]) | (bd[1:] != bd[:-1])
            starts = np.nonzero(first)[0]
            sizes = np.diff(np.append(starts, n))
            li, ri = expand_pairs(sizes)
            if not len(li):
                return pa.table({
                    "o1_orderkey": pa.array([], pa.int64()),
                    "o2_orderkey": pa.array([], pa.int64()),
                    "o_custkey": pa.array([], pa.int64()),
                    "days_apart": pa.array([], pa.int64()),
                })
            ok = s["o_orderkey"].combine_chunks().to_numpy(
                zero_copy_only=False)
            day = s["day"].combine_chunks().to_numpy(zero_copy_only=False)
            return pa.table({
                "o1_orderkey": pa.array(ok[li]),
                "o2_orderkey": pa.array(ok[ri]),
                "o_custkey": pa.array(ck[li]),
                "days_apart": pa.array(np.abs(day[li] - day[ri])),
            })

        return (
            orders.map_batches(tag, batch_format="pyarrow",
                               zero_copy_batch=True)
            .groupby("_b")
            .map_groups(pairs, batch_format="pyarrow")
        )

    def dedup_minhash_index(sf_dir):
        """Near-dup screening through the PERSISTED MinHash-LSH index
        (functions/simindex.py): the corpus is indexed once (banded
        md5-affine signatures, bucket-partitioned parquet), then every
        7th doc queries the index — reading ONLY the bucket partitions
        its band hashes touch. The oracle recomputes signatures + bands
        in SQL, so candidates AND estimates must match bit-for-bit."""
        import pyarrow as pa
        import ray.data
        from debezium_incubator_ray.functions.simindex import (
            build_minhash_index, minhash_index_query,
        )
        from debezium_incubator_ray.pipelines import events_cdc as EC

        docs = ray.data.read_parquet(
            os.path.join(sf_dir, "documents.parquet"),
            columns=["doc_id", "text"],
        )
        idx = os.path.join(EC.scratch_dir("mhidx"), "index")
        build_minhash_index(docs, idx, buckets=16)

        def pick7(t: pa.Table) -> pa.Table:
            import numpy as _np
            ids = t["doc_id"].combine_chunks().to_numpy(
                zero_copy_only=False)
            return t.filter(pa.array(ids % 7 == 0))

        qds = docs.map_batches(pick7, batch_format="pyarrow",
                               zero_copy_batch=True)
        return minhash_index_query(idx, qds, min_matches=8)

    def dedup_tile_coverage(sf_dir):
        """Positional duplicated-content coverage: each doc tiled into
        non-overlapping 24-char windows; a tile is duplicated when its
        exact string occurs at >= 2 sites corpus-wide (tiles compare by
        the same md5-64 on both sides, so the oracle is exact). Only
        (hash, doc_id) pairs shuffle — the text never moves."""
        import ray.data
        from debezium_incubator_ray.functions.dedup import (
            dup_tile_coverage,
        )

        docs = ray.data.read_parquet(
            os.path.join(sf_dir, "documents.parquet"),
            columns=["doc_id", "text"],
        )
        return dup_tile_coverage(docs, tile=24)

    def join_q7_volume(sf_dir):
        """TPC-H Q7 shape (nation-pair trade volume): revenue shipped
        between nation group A (1,6,11) and group B (2,7,12) in either
        direction, per (supp_nation, cust_nation, ship year). Both
        dimension chains reduce BEFORE the fact scan: the customer set maps
        orders to a (orderkey -> cust nation) array pair, suppliers to
        (suppkey -> supp nation) — each broadcast ONCE via ray.put (at
        lake scale the order map would cut over to the shared shuffle
        join; this is the documented broadcast path). One lineitem pass
        filters the ship window, resolves both nations, keeps unequal
        pairs, and pre-reduces exact cents x bp revenue per
        (sn, cn, year); the final groupby folds #blocks x 8 partials."""
        import numpy as np
        import pyarrow as pa
        import pyarrow.compute as pc
        import pyarrow.parquet as _pq
        import ray
        import ray.data
        from ray.data.aggregate import Sum
        from debezium_incubator_ray.functions.kernels import (
            collect_table, sorted_lookup,
        )

        GRP_A = (1, 6, 11)
        GRP_B = (2, 7, 12)
        NATS = GRP_A + GRP_B
        LO = np.datetime64("1999-01-01T00:00:00", "us").astype(np.int64)
        HI = np.datetime64("2001-01-01T00:00:00", "us").astype(np.int64)

        cust = ray.data.read_parquet(
            os.path.join(sf_dir, "customer.parquet"),
            columns=["c_custkey", "c_nationkey"],
        )

        def cpart(t: pa.Table) -> pa.Table:
            keep = pc.is_in(t["c_nationkey"],
                            value_set=pa.array(list(NATS), pa.int64()))
            return t.filter(keep)

        ct = collect_table(
            cust.map_batches(cpart, batch_format="pyarrow",
                             zero_copy_batch=True),
            empty=pa.table({"c_custkey": pa.array([], pa.int64()),
                            "c_nationkey": pa.array([], pa.int64())}),
        )
        ck = ct["c_custkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        cn = ct["c_nationkey"].to_numpy(
            zero_copy_only=False).astype(np.int64)
        o = np.argsort(ck)
        ck_ref = ray.put((ck[o], cn[o]))

        orders = ray.data.read_parquet(
            os.path.join(sf_dir, "orders.parquet"),
            columns=["o_orderkey", "o_custkey"],
        )

        def opart(t: pa.Table) -> pa.Table:
            k, n = ray.get(ck_ref)
            empty = pa.table({"o_orderkey": pa.array([], pa.int64()),
                              "cnat": pa.array([], pa.int64())})
            if len(k) == 0 or t.num_rows == 0:
                return empty
            oc = t["o_custkey"].combine_chunks().to_numpy(
                zero_copy_only=False).astype(np.int64)
            pos, keep = sorted_lookup(k, oc)
            return pa.table({
                "o_orderkey": t["o_orderkey"].combine_chunks().cast(
                    pa.int64()).filter(pa.array(keep)),
                "cnat": pa.array(n[pos][keep]),
            })

        ot = collect_table(
            orders.map_batches(opart, batch_format="pyarrow",
                               zero_copy_batch=True),
            empty=pa.table({"o_orderkey": pa.array([], pa.int64()),
                            "cnat": pa.array([], pa.int64())}),
        )
        ok = ot["o_orderkey"].to_numpy(zero_copy_only=False)
        on = ot["cnat"].to_numpy(zero_copy_only=False)
        o = np.argsort(ok)
        ord_ref = ray.put((ok[o], on[o]))

        st = _pq.read_table(
            os.path.join(sf_dir, "supplier.parquet"),
            columns=["s_suppkey", "s_nationkey"],
        )
        sk = st["s_suppkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        sn = st["s_nationkey"].to_numpy(
            zero_copy_only=False).astype(np.int64)
        o = np.argsort(sk)
        sup_ref = ray.put((sk[o], sn[o]))

        li = ray.data.read_parquet(
            os.path.join(sf_dir, "lineitem.parquet"),
            columns=["l_orderkey", "l_suppkey", "l_extendedprice",
                     "l_discount", "l_shipdate"],
        )
        EMPTY = pa.table({
            "supp_nk": pa.array([], pa.int64()),
            "cust_nk": pa.array([], pa.int64()),
            "l_year": pa.array([], pa.int64()),
            "rev_cbp": pa.array([], pa.int64()),
        })

        def lpart(t: pa.Table) -> pa.Table:
            okk, onn = ray.get(ord_ref)
            skk, snn = ray.get(sup_ref)
            if len(okk) == 0 or len(skk) == 0 or t.num_rows == 0:
                return EMPTY
            ship = t["l_shipdate"].combine_chunks().cast(
                pa.int64()).to_numpy(zero_copy_only=False)
            t = t.filter(pa.array((ship >= LO) & (ship < HI)))
            if t.num_rows == 0:
                return EMPTY
            lo = t["l_orderkey"].combine_chunks().to_numpy(
                zero_copy_only=False).astype(np.int64)
            ls = t["l_suppkey"].combine_chunks().to_numpy(
                zero_copy_only=False).astype(np.int64)
            po, fo = sorted_lookup(okk, lo)
            ps, fs = sorted_lookup(skk, ls)
            snv = snn[ps]
            cnv = onn[po]
            sa = np.isin(snv, GRP_A)
            sb = np.isin(snv, GRP_B)
            ca = np.isin(cnv, GRP_A)
            cb = np.isin(cnv, GRP_B)
            keep = fo & fs & ((sa & cb) | (sb & ca))
            if not keep.any():
                return EMPTY
            t = t.filter(pa.array(keep))
            price_c = pc.cast(
                pc.round(pc.multiply(t["l_extendedprice"], 100.0)),
                pa.int64()).to_numpy(zero_copy_only=False)
            disc_bp = pc.cast(
                pc.round(pc.multiply(t["l_discount"], 100.0)),
                pa.int64()).to_numpy(zero_copy_only=False)
            ship = t["l_shipdate"].combine_chunks().cast(
                pa.int64()).to_numpy(zero_copy_only=False)
            year = ship.astype("datetime64[us]").astype(
                "datetime64[Y]").astype(np.int64) + 1970
            g = pa.table({
                "supp_nk": pa.array(snv[keep]),
                "cust_nk": pa.array(cnv[keep]),
                "l_year": pa.array(year),
                "rev_cbp": pa.array(price_c * (100 - disc_bp)),
            }).group_by(["supp_nk", "cust_nk", "l_year"]).aggregate(
                [("rev_cbp", "sum")]
            )
            return pa.table({
                "supp_nk": g["supp_nk"], "cust_nk": g["cust_nk"],
                "l_year": g["l_year"], "rev_cbp": g["rev_cbp_sum"],
            })

        g = (
            li.map_batches(lpart, batch_format="pyarrow",
                           zero_copy_batch=True)
            .groupby(["supp_nk", "cust_nk", "l_year"])
            .aggregate(Sum("rev_cbp", alias_name="rev_cbp"))
        )
        t = collect_table(g, empty=EMPTY)
        return pa.table({
            "supp_nation": pa.array(
                [f"NATION_{int(v)}" for v in t["supp_nk"].to_pylist()],
                pa.string()),
            "cust_nation": pa.array(
                [f"NATION_{int(v)}" for v in t["cust_nk"].to_pylist()],
                pa.string()),
            "l_year": t["l_year"],
            "revenue": pa.array(
                [(int(v) + 50) // 100 / 100.0
                 for v in t["rev_cbp"].to_pylist()], pa.float64()),
        })

    def join_q8_market_share(sf_dir):
        """TPC-H Q8 shape (national market share): of ECONOMY-part
        revenue sold to AMERICA-region customers in 1999-2000, the
        share supplied by NATION_3 per order year. The three small
        sides reduce to broadcast arrays (ECONOMY partkeys; qualifying
        orderkey -> order year; target suppkeys); one lineitem pass
        accumulates numerator/denominator cents x bp per year, and the
        final share rounds half-away in EXACT integer micro space —
        float division would tie-break differently than the oracle on
        grid halves."""
        import numpy as np
        import pyarrow as pa
        import pyarrow.compute as pc
        import pyarrow.parquet as _pq
        import ray
        import ray.data
        from ray.data.aggregate import Sum
        from debezium_incubator_ray.functions.kernels import (
            collect_table, sorted_lookup,
        )

        TARGET_NAT = 3
        REGION = 1  # AMERICA
        LO = np.datetime64("1999-01-01T00:00:00", "us").astype(np.int64)
        HI = np.datetime64("2001-01-01T00:00:00", "us").astype(np.int64)

        nat = _pq.read_table(
            os.path.join(sf_dir, "nation.parquet"),
            columns=["n_nationkey", "n_regionkey"],
        )
        rnats = nat.filter(
            pc.equal(nat["n_regionkey"], REGION))["n_nationkey"].to_numpy(
                zero_copy_only=False).astype(np.int64)

        pt = _pq.read_table(
            os.path.join(sf_dir, "part.parquet"),
            columns=["p_partkey", "p_type"],
        )
        pks = np.sort(pt.filter(
            pc.equal(pt["p_type"], "ECONOMY"))["p_partkey"].to_numpy(
                zero_copy_only=False).astype(np.int64))
        pk_ref = ray.put(pks)

        st = _pq.read_table(
            os.path.join(sf_dir, "supplier.parquet"),
            columns=["s_suppkey", "s_nationkey"],
        )
        sk8 = st["s_suppkey"].to_numpy(
            zero_copy_only=False).astype(np.int64)
        so = np.argsort(sk8)
        s_is_tgt = (st["s_nationkey"].to_numpy(
            zero_copy_only=False).astype(np.int64)[so] == TARGET_NAT)
        # ALL suppliers ship (membership gates the row entirely — the
        # oracle's JOIN supplier drops unmatched rows from num AND den)
        ts_ref = ray.put((sk8[so], s_is_tgt))

        cust = ray.data.read_parquet(
            os.path.join(sf_dir, "customer.parquet"),
            columns=["c_custkey", "c_nationkey"],
        )

        def cpart(t: pa.Table) -> pa.Table:
            keep = pc.is_in(t["c_nationkey"],
                            value_set=pa.array(rnats, pa.int64()))
            return t.filter(keep).select(["c_custkey"])

        ct = collect_table(
            cust.map_batches(cpart, batch_format="pyarrow",
                             zero_copy_batch=True),
            empty=pa.table({"c_custkey": pa.array([], pa.int64())}),
        )
        cks = np.sort(ct["c_custkey"].to_numpy(
            zero_copy_only=False).astype(np.int64))
        ck_ref = ray.put(cks)

        orders = ray.data.read_parquet(
            os.path.join(sf_dir, "orders.parquet"),
            columns=["o_orderkey", "o_custkey", "o_orderdate"],
        )

        def opart(t: pa.Table) -> pa.Table:
            k = ray.get(ck_ref)
            empty = pa.table({"o_orderkey": pa.array([], pa.int64()),
                              "o_year": pa.array([], pa.int64())})
            if len(k) == 0 or t.num_rows == 0:
                return empty
            od = t["o_orderdate"].combine_chunks().cast(
                pa.int64()).to_numpy(zero_copy_only=False)
            oc = t["o_custkey"].combine_chunks().to_numpy(
                zero_copy_only=False).astype(np.int64)
            _, found = sorted_lookup(k, oc)
            keep = found & (od >= LO) & (od < HI)
            year = od.astype("datetime64[us]").astype(
                "datetime64[Y]").astype(np.int64) + 1970
            return pa.table({
                "o_orderkey": t["o_orderkey"].combine_chunks().cast(
                    pa.int64()).filter(pa.array(keep)),
                "o_year": pa.array(year[keep]),
            })

        ot = collect_table(
            orders.map_batches(opart, batch_format="pyarrow",
                               zero_copy_batch=True),
            empty=pa.table({"o_orderkey": pa.array([], pa.int64()),
                            "o_year": pa.array([], pa.int64())}),
        )
        ok = ot["o_orderkey"].to_numpy(zero_copy_only=False)
        oy = ot["o_year"].to_numpy(zero_copy_only=False)
        o = np.argsort(ok)
        ord_ref = ray.put((ok[o], oy[o]))

        li = ray.data.read_parquet(
            os.path.join(sf_dir, "lineitem.parquet"),
            columns=["l_orderkey", "l_partkey", "l_suppkey",
                     "l_extendedprice", "l_discount"],
        )
        EMPTY = pa.table({
            "o_year": pa.array([], pa.int64()),
            "num_cbp": pa.array([], pa.int64()),
            "den_cbp": pa.array([], pa.int64()),
        })

        def lpart(t: pa.Table) -> pa.Table:
            okk, oyy = ray.get(ord_ref)
            pkk = ray.get(pk_ref)
            skk, stgt = ray.get(ts_ref)
            if len(okk) == 0 or len(pkk) == 0 or t.num_rows == 0:
                return EMPTY
            lo = t["l_orderkey"].combine_chunks().to_numpy(
                zero_copy_only=False).astype(np.int64)
            lp = t["l_partkey"].combine_chunks().to_numpy(
                zero_copy_only=False).astype(np.int64)
            ls = t["l_suppkey"].combine_chunks().to_numpy(
                zero_copy_only=False).astype(np.int64)
            po, fo = sorted_lookup(okk, lo)
            pp, fp_ = sorted_lookup(pkk, lp)
            ps, fs = sorted_lookup(skk, ls)
            keep = fo & fp_ & fs
            if not keep.any():
                return EMPTY
            year = oyy[po][keep]
            is_t = stgt[ps][keep]
            t = t.filter(pa.array(keep))
            price_c = pc.cast(
                pc.round(pc.multiply(t["l_extendedprice"], 100.0)),
                pa.int64()).to_numpy(zero_copy_only=False)
            disc_bp = pc.cast(
                pc.round(pc.multiply(t["l_discount"], 100.0)),
                pa.int64()).to_numpy(zero_copy_only=False)
            rev = price_c * (100 - disc_bp)
            g = pa.table({
                "o_year": pa.array(year),
                "num_cbp": pa.array(np.where(is_t, rev, 0)),
                "den_cbp": pa.array(rev),
            }).group_by(["o_year"]).aggregate(
                [("num_cbp", "sum"), ("den_cbp", "sum")]
            )
            return pa.table({
                "o_year": g["o_year"], "num_cbp": g["num_cbp_sum"],
                "den_cbp": g["den_cbp_sum"],
            })

        g = (
            li.map_batches(lpart, batch_format="pyarrow",
                           zero_copy_batch=True)
            .groupby("o_year")
            .aggregate(Sum("num_cbp", alias_name="num_cbp"),
                       Sum("den_cbp", alias_name="den_cbp"))
        )
        t = collect_table(g, empty=EMPTY)
        years, shares = [], []
        for y, nu, de in zip(t["o_year"].to_pylist(),
                             t["num_cbp"].to_pylist(),
                             t["den_cbp"].to_pylist()):
            nu, de = int(nu), int(de)
            if de == 0:
                continue
            years.append(int(y))
            shares.append((1_000_000 * nu + de // 2) // de / 1e6)
        return pa.table({
            "o_year": pa.array(years, pa.int64()),
            "mkt_share": pa.array(shares, pa.float64()),
        })

    def join_q9_profit(sf_dir):
        """TPC-H Q9 shape (product-type profit): per (supplier nation,
        ship year), sum of ext*(1-disc) - retailprice*qty over parts
        whose name contains 'red' (partsupp does not exist in this
        corpus, so p_retailprice stands in for ps_supplycost — the
        join/aggregation shape is unchanged). The 'red' partkey ->
        retail-cents array and the suppkey -> nation array broadcast
        once; one lineitem pass computes the EXACT cents x bp amount
        (possibly negative) and pre-reduces per (nation, year). Output
        divides the exact int sum by 10^4 on both sides — identical
        doubles, no rounding step to diverge on."""
        import numpy as np
        import pyarrow as pa
        import pyarrow.compute as pc
        import pyarrow.parquet as _pq
        import ray
        import ray.data
        from ray.data.aggregate import Sum
        from debezium_incubator_ray.functions.kernels import (
            collect_table, sorted_lookup,
        )

        pt = _pq.read_table(
            os.path.join(sf_dir, "part.parquet"),
            columns=["p_partkey", "p_name", "p_retailprice"],
        )
        m = pc.match_substring(pt["p_name"], "red")
        pt = pt.filter(m)
        pk = pt["p_partkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        rc = pc.cast(pc.round(pc.multiply(pt["p_retailprice"], 100.0)),
                     pa.int64()).to_numpy(zero_copy_only=False)
        o = np.argsort(pk)
        pk_ref = ray.put((pk[o], rc[o]))

        st = _pq.read_table(
            os.path.join(sf_dir, "supplier.parquet"),
            columns=["s_suppkey", "s_nationkey"],
        )
        sk = st["s_suppkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        sn = st["s_nationkey"].to_numpy(
            zero_copy_only=False).astype(np.int64)
        o = np.argsort(sk)
        sup_ref = ray.put((sk[o], sn[o]))

        li = ray.data.read_parquet(
            os.path.join(sf_dir, "lineitem.parquet"),
            columns=["l_partkey", "l_suppkey", "l_quantity",
                     "l_extendedprice", "l_discount", "l_shipdate"],
        )
        EMPTY = pa.table({
            "s_nk": pa.array([], pa.int64()),
            "o_year": pa.array([], pa.int64()),
            "amt_cbp": pa.array([], pa.int64()),
        })

        def lpart(t: pa.Table) -> pa.Table:
            pkk, rcc = ray.get(pk_ref)
            skk, snn = ray.get(sup_ref)
            if len(pkk) == 0 or len(skk) == 0 or t.num_rows == 0:
                return EMPTY
            lp = t["l_partkey"].combine_chunks().to_numpy(
                zero_copy_only=False).astype(np.int64)
            ls = t["l_suppkey"].combine_chunks().to_numpy(
                zero_copy_only=False).astype(np.int64)
            pp, fpart = sorted_lookup(pkk, lp)
            ps, fsup = sorted_lookup(skk, ls)
            # supplier membership gates the row (the oracle's inner
            # JOIN supplier keeps no row for a missing suppkey)
            keep = fpart & fsup
            if not keep.any():
                return EMPTY
            retail_c = rcc[pp][keep]
            nk = snn[ps][keep]
            t = t.filter(pa.array(keep))
            price_c = pc.cast(
                pc.round(pc.multiply(t["l_extendedprice"], 100.0)),
                pa.int64()).to_numpy(zero_copy_only=False)
            disc_bp = pc.cast(
                pc.round(pc.multiply(t["l_discount"], 100.0)),
                pa.int64()).to_numpy(zero_copy_only=False)
            qty_c = pc.cast(
                pc.round(pc.multiply(t["l_quantity"], 100.0)),
                pa.int64()).to_numpy(zero_copy_only=False)
            amt = price_c * (100 - disc_bp) - retail_c * qty_c
            ship = t["l_shipdate"].combine_chunks().cast(
                pa.int64()).to_numpy(zero_copy_only=False)
            year = ship.astype("datetime64[us]").astype(
                "datetime64[Y]").astype(np.int64) + 1970
            g = pa.table({
                "s_nk": pa.array(nk),
                "o_year": pa.array(year),
                "amt_cbp": pa.array(amt),
            }).group_by(["s_nk", "o_year"]).aggregate(
                [("amt_cbp", "sum")]
            )
            return pa.table({
                "s_nk": g["s_nk"], "o_year": g["o_year"],
                "amt_cbp": g["amt_cbp_sum"],
            })

        g = (
            li.map_batches(lpart, batch_format="pyarrow",
                           zero_copy_batch=True)
            .groupby(["s_nk", "o_year"])
            .aggregate(Sum("amt_cbp", alias_name="amt_cbp"))
        )
        t = collect_table(g, empty=EMPTY)
        return pa.table({
            "nation": pa.array(
                [f"NATION_{int(v)}" for v in t["s_nk"].to_pylist()],
                pa.string()),
            "o_year": t["o_year"],
            "sum_profit": pa.array(
                [int(v) / 10000.0 for v in t["amt_cbp"].to_pylist()],
                pa.float64()),
        })

    def join_q12_priority_class(sf_dir):
        """TPC-H Q12 shape (shipment class vs order priority): per
        lineitem returnflag (standing in for shipmode — this corpus has
        none), how many 2000-shipped lines belong to URGENT/HIGH
        orders vs the rest. The order-priority bitmap broadcasts as a
        sorted (orderkey, is_high) pair; one lineitem pass folds both
        counters per flag."""
        import numpy as np
        import pyarrow as pa
        import pyarrow.compute as pc
        import ray
        import ray.data
        from ray.data.aggregate import Sum
        from debezium_incubator_ray.functions.kernels import (
            collect_table, sorted_lookup,
        )

        LO = np.datetime64("2000-01-01T00:00:00", "us").astype(np.int64)
        HI = np.datetime64("2001-01-01T00:00:00", "us").astype(np.int64)

        orders = ray.data.read_parquet(
            os.path.join(sf_dir, "orders.parquet"),
            columns=["o_orderkey", "o_orderpriority"],
        )

        def opart(t: pa.Table) -> pa.Table:
            hi = pc.is_in(t["o_orderpriority"],
                          value_set=pa.array(["1-URGENT", "2-HIGH"]))
            return pa.table({
                "o_orderkey": t["o_orderkey"].combine_chunks().cast(
                    pa.int64()),
                "is_high": pc.cast(hi, pa.int8()),
            })

        ot = collect_table(
            orders.map_batches(opart, batch_format="pyarrow",
                               zero_copy_batch=True),
            empty=pa.table({"o_orderkey": pa.array([], pa.int64()),
                            "is_high": pa.array([], pa.int8())}),
        )
        ok = ot["o_orderkey"].to_numpy(zero_copy_only=False)
        ih = ot["is_high"].to_numpy(zero_copy_only=False).astype(np.int64)
        o = np.argsort(ok)
        ord_ref = ray.put((ok[o], ih[o]))

        li = ray.data.read_parquet(
            os.path.join(sf_dir, "lineitem.parquet"),
            columns=["l_orderkey", "l_returnflag", "l_shipdate"],
        )
        EMPTY = pa.table({
            "l_returnflag": pa.array([], pa.string()),
            "high_line_count": pa.array([], pa.int64()),
            "low_line_count": pa.array([], pa.int64()),
        })

        def lpart(t: pa.Table) -> pa.Table:
            okk, ihh = ray.get(ord_ref)
            ship = t["l_shipdate"].combine_chunks().cast(
                pa.int64()).to_numpy(zero_copy_only=False)
            t = t.filter(pa.array((ship >= LO) & (ship < HI)))
            if t.num_rows == 0 or len(okk) == 0:
                return EMPTY
            lo = t["l_orderkey"].combine_chunks().to_numpy(
                zero_copy_only=False).astype(np.int64)
            pos, found = sorted_lookup(okk, lo)
            if not found.any():
                return EMPTY
            t = t.filter(pa.array(found))
            hi = ihh[pos[found]]
            g = pa.table({
                "l_returnflag": t["l_returnflag"],
                "high_line_count": pa.array(hi),
                "low_line_count": pa.array(1 - hi),
            }).group_by(["l_returnflag"]).aggregate(
                [("high_line_count", "sum"), ("low_line_count", "sum")]
            )
            return pa.table({
                "l_returnflag": g["l_returnflag"],
                "high_line_count": g["high_line_count_sum"],
                "low_line_count": g["low_line_count_sum"],
            })

        g = (
            li.map_batches(lpart, batch_format="pyarrow",
                           zero_copy_batch=True)
            .groupby("l_returnflag")
            .aggregate(Sum("high_line_count", alias_name="high_line_count"),
                       Sum("low_line_count", alias_name="low_line_count"))
        )
        return collect_table(g, empty=EMPTY)

    def join_q13_custdist(sf_dir):
        """TPC-H Q13 shape (customer order-count distribution): how many
        customers placed exactly k non-URGENT orders, INCLUDING the
        zero-order bucket from the left outer join. The engine never
        joins: orders pre-reduce to per-customer counts (per-block
        partial + one bucketed groupby on custkey), the count histogram
        folds per block, and the k=0 bucket is total customers minus
        matched customers — a metadata-sized subtraction (the customer
        count comes from the pruned read's row count, no data pull)."""
        import pyarrow as pa
        import ray.data
        from ray.data.aggregate import Sum
        from debezium_incubator_ray.functions.kernels import collect_table
        import numpy as np

        n_cust = ray.data.read_parquet(
            os.path.join(sf_dir, "customer.parquet"),
            columns=["c_custkey"],
        ).count()

        orders = ray.data.read_parquet(
            os.path.join(sf_dir, "orders.parquet"),
            columns=["o_custkey", "o_orderpriority"],
        )

        def opart(t: pa.Table) -> pa.Table:
            import pyarrow.compute as pc
            t = t.filter(pc.not_equal(t["o_orderpriority"], "1-URGENT"))
            g = t.group_by(["o_custkey"]).aggregate([("o_custkey",
                                                      "count")])
            return pa.table({
                "o_custkey": g["o_custkey"],
                "n": g["o_custkey_count"].cast(pa.int64()),
            })

        per_cust = (
            orders.map_batches(opart, batch_format="pyarrow",
                               zero_copy_batch=True)
            .groupby("o_custkey")
            .aggregate(Sum("n", alias_name="c_count"))
        )

        def hpart(t: pa.Table) -> pa.Table:
            g = t.group_by(["c_count"]).aggregate(
                [("o_custkey", "count")])
            return pa.table({
                "c_count": g["c_count"],
                "custdist": g["o_custkey_count"].cast(pa.int64()),
            })

        h = (
            per_cust.map_batches(hpart, batch_format="pyarrow",
                                 zero_copy_batch=True)
            .groupby("c_count")
            .aggregate(Sum("custdist", alias_name="custdist"))
        )
        t = collect_table(h, empty=pa.table({
            "c_count": pa.array([], pa.int64()),
            "custdist": pa.array([], pa.int64()),
        }))
        matched = int(np.sum(t["custdist"].to_numpy(
            zero_copy_only=False))) if t.num_rows else 0
        zero = int(n_cust) - matched
        counts = t["c_count"].to_pylist()
        dist = t["custdist"].to_pylist()
        if zero > 0:
            # the 0 bucket exists in the oracle's LEFT JOIN only when
            # some customer actually has no qualifying order
            counts, dist = counts + [0], dist + [zero]
        return pa.table({
            "c_count": pa.array([int(v) for v in counts], pa.int64()),
            "custdist": pa.array([int(v) for v in dist], pa.int64()),
        })

    def join_q15_top_supplier(sf_dir):
        """TPC-H Q15 shape (top supplier(s) by quarterly revenue, ties
        kept): revenue per suppkey over one ship quarter folds per
        block then through one supplier-keyed groupby — the result is
        #suppliers rows (a bounded dimension), so the max-and-filter
        finishes driver-side on exact cents x bp integers; supplier
        names attach from the driver-read dimension."""
        import numpy as np
        import pyarrow as pa
        import pyarrow.compute as pc
        import pyarrow.parquet as _pq
        import ray.data
        from ray.data.aggregate import Sum
        from debezium_incubator_ray.functions.kernels import (
            collect_table, sorted_lookup,
        )

        LO = np.datetime64("2000-01-01T00:00:00", "us").astype(np.int64)
        HI = np.datetime64("2000-04-01T00:00:00", "us").astype(np.int64)

        li = ray.data.read_parquet(
            os.path.join(sf_dir, "lineitem.parquet"),
            columns=["l_suppkey", "l_extendedprice", "l_discount",
                     "l_shipdate"],
        )
        EMPTY = pa.table({
            "l_suppkey": pa.array([], pa.int64()),
            "rev_cbp": pa.array([], pa.int64()),
        })

        def lpart(t: pa.Table) -> pa.Table:
            ship = t["l_shipdate"].combine_chunks().cast(
                pa.int64()).to_numpy(zero_copy_only=False)
            t = t.filter(pa.array((ship >= LO) & (ship < HI)))
            if t.num_rows == 0:
                return EMPTY
            price_c = pc.cast(
                pc.round(pc.multiply(t["l_extendedprice"], 100.0)),
                pa.int64()).to_numpy(zero_copy_only=False)
            disc_bp = pc.cast(
                pc.round(pc.multiply(t["l_discount"], 100.0)),
                pa.int64()).to_numpy(zero_copy_only=False)
            g = pa.table({
                "l_suppkey": t["l_suppkey"].combine_chunks().cast(
                    pa.int64()),
                "rev_cbp": pa.array(price_c * (100 - disc_bp)),
            }).group_by(["l_suppkey"]).aggregate([("rev_cbp", "sum")])
            return pa.table({
                "l_suppkey": g["l_suppkey"], "rev_cbp": g["rev_cbp_sum"],
            })

        g = (
            li.map_batches(lpart, batch_format="pyarrow",
                           zero_copy_batch=True)
            .groupby("l_suppkey")
            .aggregate(Sum("rev_cbp", alias_name="rev_cbp"))
        )
        t = collect_table(g, empty=EMPTY)
        if t.num_rows == 0:
            return pa.table({
                "s_suppkey": pa.array([], pa.int64()),
                "s_name": pa.array([], pa.string()),
                "total_revenue": pa.array([], pa.float64()),
            })
        st = _pq.read_table(
            os.path.join(sf_dir, "supplier.parquet"),
            columns=["s_suppkey", "s_name"],
        )
        sk = st["s_suppkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        names = st["s_name"]
        o = np.argsort(sk)
        # Restrict to suppkeys present in the supplier dimension BEFORE
        # taking the max — the oracle joins supplier before MAX(), so an
        # unmatched top revenue must yield the next-best MATCHED supplier,
        # not an empty result (divergent only on non-FK corpora, but the
        # engine should agree with the oracle on any input).
        allk = t["l_suppkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        _, matched = sorted_lookup(sk[o], allk)
        t = t.filter(pa.array(matched))
        if t.num_rows == 0:
            return pa.table({
                "s_suppkey": pa.array([], pa.int64()),
                "s_name": pa.array([], pa.string()),
                "total_revenue": pa.array([], pa.float64()),
            })
        rev = t["rev_cbp"].to_numpy(zero_copy_only=False)
        best = rev == rev.max()
        t = t.filter(pa.array(best))
        wk = t["l_suppkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        pos, found = sorted_lookup(sk[o], wk)
        nm = names.take(pa.array(o[pos]))
        return pa.table({
            "s_suppkey": t["l_suppkey"],
            "s_name": nm,
            "total_revenue": pa.array(
                [(int(v) + 50) // 100 / 100.0
                 for v in t["rev_cbp"].to_pylist()], pa.float64()),
        })

    def join_q20_dominant_supplier(sf_dir):
        """TPC-H Q20 shape (potential part promotion): suppliers who
        DOMINATED a PROMO part's 1997 volume — shipped more than half
        of the part's total quantity that year (this corpus has no
        partsupp availqty, so observed volume share stands in for the
        excess-stock predicate), counted per supplier. Quantities are
        integral: the half-share filter cross-multiplies exactly
        (2·q > total). PROMO partkeys broadcast; per-batch (part,
        supplier) quantity partials fold driver-side (bounded by
        |PROMO parts| × suppliers-per-part, the q2 posture)."""
        import numpy as np
        import pyarrow as pa
        import pyarrow.compute as pc
        import pyarrow.parquet as _pq
        import ray
        import ray.data
        from debezium_incubator_ray.functions.kernels import (
            collect_table, sorted_lookup,
        )

        LO = np.datetime64("1997-01-01T00:00:00", "us").astype(np.int64)
        HI = np.datetime64("1998-01-01T00:00:00", "us").astype(np.int64)

        pt = _pq.read_table(os.path.join(sf_dir, "part.parquet"),
                            columns=["p_partkey", "p_type"])
        pk = np.sort(pt.filter(pc.equal(pt["p_type"], "PROMO"))[
            "p_partkey"].to_numpy(zero_copy_only=False).astype(np.int64))
        part_ref = ray.put(pk)

        li = ray.data.read_parquet(
            os.path.join(sf_dir, "lineitem.parquet"),
            columns=["l_partkey", "l_suppkey", "l_quantity",
                     "l_shipdate"],
        )
        EMPTY = pa.table({"pk": pa.array([], pa.int64()),
                          "sk": pa.array([], pa.int64()),
                          "q": pa.array([], pa.int64())})

        def lpart(t: pa.Table) -> pa.Table:
            pks = ray.get(part_ref)
            if t.num_rows == 0 or len(pks) == 0:
                return EMPTY
            ship = t["l_shipdate"].combine_chunks().cast(
                pa.int64()).to_numpy(zero_copy_only=False)
            lp = t["l_partkey"].combine_chunks().to_numpy(
                zero_copy_only=False).astype(np.int64)
            _, pf = sorted_lookup(pks, lp)
            m = pf & (ship >= LO) & (ship < HI)
            if not m.any():
                return EMPTY
            t = t.filter(pa.array(m))
            g = pa.table({
                "pk": pa.array(lp[m], pa.int64()),
                "sk": t["l_suppkey"].combine_chunks().cast(pa.int64()),
                "q": pc.cast(pc.round(t["l_quantity"]), pa.int64()),
            }).group_by(["pk", "sk"]).aggregate([("q", "sum")])
            return pa.table({"pk": g["pk"], "sk": g["sk"],
                             "q": g["q_sum"]})

        rows = collect_table(li.map_batches(
            lpart, batch_format="pyarrow", zero_copy_batch=True,
        ), empty=EMPTY)
        pkv = rows["pk"].to_numpy(zero_copy_only=False)
        skv = rows["sk"].to_numpy(zero_copy_only=False)
        qv = rows["q"].to_numpy(zero_copy_only=False)
        if len(pkv) == 0:
            return pa.table({"s_name": pa.array([], pa.string()),
                             "n_parts": pa.array([], pa.int64())})
        # merge cross-batch partials per (part, supp), totals per part
        order = np.lexsort((skv, pkv))
        pkv, skv, qv = pkv[order], skv[order], qv[order]
        pair = np.ones(len(pkv), bool)
        pair[1:] = (pkv[1:] != pkv[:-1]) | (skv[1:] != skv[:-1])
        ps = np.nonzero(pair)[0]
        pku, sku = pkv[ps], skv[ps]
        qu = np.add.reduceat(qv, ps)
        pstart = np.ones(len(pku), bool)
        pstart[1:] = pku[1:] != pku[:-1]
        os_ = np.nonzero(pstart)[0]
        tot = np.add.reduceat(qu, os_)
        pidx = np.cumsum(pstart) - 1
        win = 2 * qu > tot[pidx]
        wsk = sku[win]
        usk, counts = np.unique(wsk, return_counts=True)
        st = _pq.read_table(os.path.join(sf_dir, "supplier.parquet"),
                            columns=["s_suppkey", "s_name"])
        sk2 = st["s_suppkey"].to_numpy(zero_copy_only=False).astype(
            np.int64)
        so = np.argsort(sk2)
        pos, found = sorted_lookup(sk2[so], usk)
        return pa.table({
            "s_name": st["s_name"].take(pa.array(so[pos[found]])),
            "n_parts": pa.array(counts[found], pa.int64()),
        })

    def join_q2_min_cost_supplier(sf_dir):
        """TPC-H Q2 shape (minimum-cost supplier): for size-15 parts,
        the EUROPE supplier with the lowest observed unit cost — this
        corpus has no partsupp, so lineitem IS the observed
        part-supplier relation (the q16 convention) and unit cost =
        min(price-cents / quantity) over a pair's lines (both integral,
        the double division is bit-identical on both sides; ties break
        by lower suppkey). Dimensions broadcast; one lineitem pass
        emits per-batch (part, supp, min-unit) partials; the driver
        fold is bounded by |size-15 parts| × |EUROPE suppliers|."""
        import numpy as np
        import pyarrow as pa
        import pyarrow.compute as pc
        import pyarrow.parquet as _pq
        import ray
        import ray.data
        from debezium_incubator_ray.functions.kernels import (
            collect_table, sorted_lookup,
        )

        pt = _pq.read_table(os.path.join(sf_dir, "part.parquet"),
                            columns=["p_partkey", "p_size"])
        pk = np.sort(pt.filter(pc.equal(pt["p_size"], 15))[
            "p_partkey"].to_numpy(zero_copy_only=False).astype(np.int64))
        nt = _pq.read_table(os.path.join(sf_dir, "nation.parquet"))
        rt = _pq.read_table(os.path.join(sf_dir, "region.parquet"))
        eu_reg = rt.filter(pc.equal(rt["r_name"], "EUROPE"))[
            "r_regionkey"].to_numpy(zero_copy_only=False)
        eu_nat = nt.filter(pc.is_in(
            nt["n_regionkey"], value_set=pa.array(eu_reg)))
        nat_name = dict(zip(
            eu_nat["n_nationkey"].to_numpy(zero_copy_only=False),
            eu_nat["n_name"].to_pylist()))
        st = _pq.read_table(os.path.join(sf_dir, "supplier.parquet"))
        st = st.filter(pc.is_in(
            st["s_nationkey"],
            value_set=pa.array(list(nat_name), pa.int64())))
        sk = st["s_suppkey"].to_numpy(zero_copy_only=False).astype(
            np.int64)
        so = np.argsort(sk)
        part_ref = ray.put(pk)
        supp_ref = ray.put(sk[so])

        li = ray.data.read_parquet(
            os.path.join(sf_dir, "lineitem.parquet"),
            columns=["l_partkey", "l_suppkey", "l_quantity",
                     "l_extendedprice"],
        )
        EMPTY = pa.table({"pk": pa.array([], pa.int64()),
                          "sk": pa.array([], pa.int64()),
                          "unit": pa.array([], pa.float64())})

        def lpart(t: pa.Table) -> pa.Table:
            pks = ray.get(part_ref)
            sks = ray.get(supp_ref)
            if t.num_rows == 0 or len(pks) == 0 or len(sks) == 0:
                return EMPTY
            lp = t["l_partkey"].combine_chunks().to_numpy(
                zero_copy_only=False).astype(np.int64)
            ls = t["l_suppkey"].combine_chunks().to_numpy(
                zero_copy_only=False).astype(np.int64)
            _, pf = sorted_lookup(pks, lp)
            _, sf = sorted_lookup(sks, ls)
            m = pf & sf
            if not m.any():
                return EMPTY
            t = t.filter(pa.array(m))
            cents = pc.cast(
                pc.round(pc.multiply(t["l_extendedprice"], 100.0)),
                pa.int64()).to_numpy(zero_copy_only=False)
            qty = pc.cast(pc.round(t["l_quantity"]),
                          pa.int64()).to_numpy(zero_copy_only=False)
            unit = cents.astype(np.float64) / qty.astype(np.float64)
            g = pa.table({
                "pk": pa.array(lp[m], pa.int64()),
                "sk": pa.array(ls[m], pa.int64()),
                "unit": pa.array(unit, pa.float64()),
            }).group_by(["pk", "sk"]).aggregate([("unit", "min")])
            return pa.table({"pk": g["pk"], "sk": g["sk"],
                             "unit": g["unit_min"]})

        rows = collect_table(li.map_batches(
            lpart, batch_format="pyarrow", zero_copy_batch=True,
        ), empty=EMPTY)
        pkv = rows["pk"].to_numpy(zero_copy_only=False)
        skv = rows["sk"].to_numpy(zero_copy_only=False)
        uv = rows["unit"].to_numpy(zero_copy_only=False)
        if len(pkv) == 0:
            return pa.table({
                "p_partkey": pa.array([], pa.int64()),
                "s_name": pa.array([], pa.string()),
                "n_name": pa.array([], pa.string()),
                "s_acctbal": pa.array([], pa.float64()),
                "unit_cost": pa.array([], pa.float64()),
            })
        # merge cross-batch partials: min unit per (part, supp), then
        # argmin per part by (unit, suppkey)
        order = np.lexsort((skv, uv, pkv))
        pkv, skv, uv = pkv[order], skv[order], uv[order]
        # sorted by (part, unit, suppkey): the first row per part IS the
        # (min-unit, lowest-suppkey) winner — cross-batch duplicate
        # (part, supp) partials sort behind it and fall away
        first_part = np.ones(len(pkv), bool)
        first_part[1:] = pkv[1:] != pkv[:-1]
        wpk, wsk, wu = pkv[first_part], skv[first_part], uv[first_part]
        pos, found = sorted_lookup(sk[so], wsk)
        nat = st["s_nationkey"].to_numpy(zero_copy_only=False)[so][
            pos[found]]
        return pa.table({
            "p_partkey": pa.array(wpk[found], pa.int64()),
            "s_name": st["s_name"].take(pa.array(so[pos[found]])),
            "n_name": pa.array([nat_name[n] for n in nat], pa.string()),
            "s_acctbal": st["s_acctbal"].take(pa.array(so[pos[found]])),
            "unit_cost": pa.array(wu[found], pa.float64()),
        })

    def join_q11_important_parts(sf_dir):
        """TPC-H Q11 shape (important stock): per-part value observed
        through one supplier nation-group's lineitems (s_nationkey % 5
        == 3 — the q7-style group keeps the smallest test scale
        non-vacuous; no partsupp in this corpus, so lineitem IS the
        observed relation), keeping parts whose value exceeds 1.5× the
        average part value — cross-multiplied in exact integer cents
        (2·n·value > 3·total), never a float mean."""
        import numpy as np
        import pyarrow as pa
        import pyarrow.compute as pc
        import pyarrow.parquet as _pq
        import ray
        import ray.data
        from ray.data.aggregate import Sum
        from debezium_incubator_ray.functions.kernels import (
            collect_table, sorted_lookup,
        )

        st = _pq.read_table(os.path.join(sf_dir, "supplier.parquet"),
                            columns=["s_suppkey", "s_nationkey"])
        nk = st["s_nationkey"].to_numpy(zero_copy_only=False).astype(
            np.int64)
        sk = st["s_suppkey"].to_numpy(zero_copy_only=False).astype(
            np.int64)[nk % 5 == 3]
        supp_ref = ray.put(np.sort(sk))

        li = ray.data.read_parquet(
            os.path.join(sf_dir, "lineitem.parquet"),
            columns=["l_partkey", "l_suppkey", "l_extendedprice"],
        )
        EMPTY = pa.table({"p_partkey": pa.array([], pa.int64()),
                          "cents": pa.array([], pa.int64())})

        def lpart(t: pa.Table) -> pa.Table:
            sks = ray.get(supp_ref)
            if t.num_rows == 0 or len(sks) == 0:
                return EMPTY
            ls = t["l_suppkey"].combine_chunks().to_numpy(
                zero_copy_only=False).astype(np.int64)
            _, found = sorted_lookup(sks, ls)
            if not found.any():
                return EMPTY
            t = t.filter(pa.array(found))
            g = pa.table({
                "p_partkey": t["l_partkey"].combine_chunks().cast(
                    pa.int64()),
                "cents": pc.cast(
                    pc.round(pc.multiply(t["l_extendedprice"], 100.0)),
                    pa.int64()),
            }).group_by(["p_partkey"]).aggregate([("cents", "sum")])
            return pa.table({"p_partkey": g["p_partkey"],
                             "cents": g["cents_sum"]})

        g = (
            li.map_batches(lpart, batch_format="pyarrow",
                           zero_copy_batch=True)
            .groupby("p_partkey").aggregate(Sum("cents",
                                               alias_name="cents"))
        )
        t = collect_table(g, empty=EMPTY)
        cents = t["cents"].to_numpy(zero_copy_only=False)
        n = len(cents)
        tot = int(cents.sum())
        if n == 0:
            return pa.table({"p_partkey": pa.array([], pa.int64()),
                             "value": pa.array([], pa.float64())})
        keep = (2 * n * cents.astype(object) > 3 * tot).astype(bool)
        t = t.filter(pa.array(keep))
        return pa.table({
            "p_partkey": t["p_partkey"],
            "value": pa.array(
                [int(v) / 100.0 for v in t["cents"].to_pylist()],
                pa.float64()),
        })

    def join_q21_waiting_supplier(sf_dir):
        """TPC-H Q21 shape (suppliers who kept orders waiting): in
        finished ('F') multi-supplier orders, the supplier whose
        lineitems were the ONLY late ones (shipped > 60 days after the
        order date — this corpus's lateness analog), counted per
        supplier. The F-order dates broadcast sorted (q12 pattern);
        per-batch partials reduce to (order, supplier, any-late) rows;
        orders co-locate by hash(orderkey) % 64 buckets and each
        bucket resolves its orders with one vectorized sort +
        run-length pass — never a per-order group."""
        import numpy as np
        import pyarrow as pa
        import pyarrow.compute as pc
        import pyarrow.parquet as _pq
        import ray
        import ray.data
        from ray.data.aggregate import Sum
        from debezium_incubator_ray.functions.kernels import (
            collect_table, sorted_lookup,
        )
        from debezium_incubator_ray.hashing import partition_ids

        LATE_US = 60 * 86_400 * 1_000_000
        B = 64

        orders = ray.data.read_parquet(
            os.path.join(sf_dir, "orders.parquet"),
            columns=["o_orderkey", "o_orderdate", "o_orderstatus"],
        )

        def opart(t: pa.Table) -> pa.Table:
            t = t.filter(pc.equal(t["o_orderstatus"], "F"))
            return pa.table({
                "ok": t["o_orderkey"].combine_chunks().cast(pa.int64()),
                "od": t["o_orderdate"].combine_chunks().cast(pa.int64()),
            })

        ot = collect_table(orders.map_batches(
            opart, batch_format="pyarrow", zero_copy_batch=True,
        ), empty=pa.table({"ok": pa.array([], pa.int64()),
                           "od": pa.array([], pa.int64())}))
        okv = ot["ok"].to_numpy(zero_copy_only=False)
        oo = np.argsort(okv)
        ord_ref = ray.put((okv[oo],
                           ot["od"].to_numpy(zero_copy_only=False)[oo]))

        li = ray.data.read_parquet(
            os.path.join(sf_dir, "lineitem.parquet"),
            columns=["l_orderkey", "l_suppkey", "l_shipdate"],
        )
        EMPTY = pa.table({
            "okey": pa.array([], pa.int64()),
            "skey": pa.array([], pa.int64()),
            "late": pa.array([], pa.int64()),
            "b": pa.array([], pa.int32()),
        })

        def lpart(t: pa.Table) -> pa.Table:
            okk, odd = ray.get(ord_ref)
            if t.num_rows == 0 or len(okk) == 0:
                return EMPTY
            lo = t["l_orderkey"].combine_chunks().to_numpy(
                zero_copy_only=False).astype(np.int64)
            pos, found = sorted_lookup(okk, lo)
            if not found.any():
                return EMPTY
            ship = t["l_shipdate"].combine_chunks().cast(
                pa.int64()).to_numpy(zero_copy_only=False)
            late = (ship > odd[np.clip(pos, 0, len(odd) - 1)]
                    + LATE_US).astype(np.int64)
            g = pa.table({
                "okey": pa.array(lo[found], pa.int64()),
                "skey": t.filter(pa.array(found))[
                    "l_suppkey"].combine_chunks().cast(pa.int64()),
                "late": pa.array(late[found], pa.int64()),
            }).group_by(["okey", "skey"]).aggregate([("late", "max")])
            ok2 = g["okey"].to_numpy(zero_copy_only=False)
            return pa.table({
                "okey": g["okey"], "skey": g["skey"],
                "late": g["late_max"],
                "b": pa.array(partition_ids(
                    pa.array(ok2), B, "hash"), pa.int32()),
            })

        def resolve(g: pa.Table) -> pa.Table:
            ok2 = g["okey"].to_numpy(zero_copy_only=False)
            sk2 = g["skey"].to_numpy(zero_copy_only=False)
            lt2 = g["late"].to_numpy(zero_copy_only=False)
            order = np.lexsort((sk2, ok2))
            ok2, sk2, lt2 = ok2[order], sk2[order], lt2[order]
            # merge duplicate (order, supplier) partials: late = max
            key_change = np.ones(len(ok2), bool)
            key_change[1:] = (ok2[1:] != ok2[:-1]) | (sk2[1:] != sk2[:-1])
            starts = np.nonzero(key_change)[0]
            oku = ok2[starts]
            sku = sk2[starts]
            ltu = np.maximum.reduceat(lt2, starts)
            # per-order counts over the merged rows
            ostart = np.ones(len(oku), bool)
            ostart[1:] = oku[1:] != oku[:-1]
            os_ = np.nonzero(ostart)[0]
            n_supp = np.diff(np.append(os_, len(oku)))
            n_late = np.add.reduceat(ltu, os_)
            oidx = np.cumsum(ostart) - 1
            win = ((n_supp[oidx] >= 2) & (n_late[oidx] == 1)
                   & (ltu == 1))
            return pa.table({
                "skey": pa.array(sku[win], pa.int64()),
                "n": pa.array(np.ones(int(win.sum()), np.int64)),
            })

        g = (
            li.map_batches(lpart, batch_format="pyarrow",
                           zero_copy_batch=True)
            .groupby("b")
            .map_groups(resolve, batch_format="pyarrow")
            .groupby("skey").aggregate(Sum("n", alias_name="numwait"))
        )
        t = collect_table(g, empty=pa.table({
            "skey": pa.array([], pa.int64()),
            "numwait": pa.array([], pa.int64()),
        }))
        st = _pq.read_table(os.path.join(sf_dir, "supplier.parquet"),
                            columns=["s_suppkey", "s_name"])
        sk = st["s_suppkey"].to_numpy(zero_copy_only=False).astype(
            np.int64)
        so = np.argsort(sk)
        wk = t["skey"].to_numpy(zero_copy_only=False).astype(np.int64)
        pos, found = sorted_lookup(sk[so], wk)
        t = t.filter(pa.array(found))
        return pa.table({
            "s_name": st["s_name"].take(pa.array(so[pos[found]])),
            "numwait": t["numwait"],
        })

    def join_q22_global_sales(sf_dir):
        """TPC-H Q22 shape (global sales opportunity): customers with an
        above-average POSITIVE account balance and NO RECENT orders
        (none since 2000 — this corpus's every customer has SOME order,
        so recency stands in for Q22's 7-year silence), grouped by
        'country code' (c_custkey % 7 — no phone column). Balances fold
        in exact cents; the above-average filter cross-multiplies
        (cents·n > Σcents, no float mean); the recently-ordering
        customer set reduces distributed (per-batch unique custkeys)
        and is bounded by the customer dimension — the same
        node-sized-dimension posture every join_q* query takes."""
        import numpy as np
        import pyarrow as pa
        import pyarrow.compute as pc
        import pyarrow.parquet as _pq
        import ray.data
        from debezium_incubator_ray.functions.kernels import collect_table

        RECENT = np.datetime64("2000-01-01T00:00:00", "us").astype(
            np.int64)
        cust = _pq.read_table(
            os.path.join(sf_dir, "customer.parquet"),
            columns=["c_custkey", "c_acctbal"],
        )
        ck = cust["c_custkey"].to_numpy(zero_copy_only=False).astype(
            np.int64)
        cents = pc.cast(
            pc.round(pc.multiply(cust["c_acctbal"], 100.0)),
            pa.int64()).to_numpy(zero_copy_only=False)

        orders = ray.data.read_parquet(
            os.path.join(sf_dir, "orders.parquet"),
            columns=["o_custkey", "o_orderdate"],
        )

        def opart(t: pa.Table) -> pa.Table:
            od = t["o_orderdate"].combine_chunks().cast(
                pa.int64()).to_numpy(zero_copy_only=False)
            t = t.filter(pa.array(od >= RECENT))
            u = np.unique(t["o_custkey"].combine_chunks().to_numpy(
                zero_copy_only=False).astype(np.int64))
            return pa.table({"ckey": pa.array(u, pa.int64())})

        with_orders = np.unique(collect_table(
            orders.map_batches(opart, batch_format="pyarrow",
                               zero_copy_batch=True),
            empty=pa.table({"ckey": pa.array([], pa.int64())}),
        )["ckey"].to_numpy(zero_copy_only=False))

        pos_mask = cents > 0
        n_pos = int(pos_mask.sum())
        sum_pos = int(cents[pos_mask].sum())
        has_orders = np.isin(ck, with_orders)
        cand = pos_mask & ~has_orders & (cents * n_pos > sum_pos)
        code = ck[cand] % 7
        numcust = np.bincount(code, minlength=7)
        tot = np.zeros(7, np.int64)
        np.add.at(tot, code, cents[cand])
        nz = np.nonzero(numcust)[0]
        return pa.table({
            "cntrycode": pa.array(nz, pa.int64()),
            "numcust": pa.array(numcust[nz], pa.int64()),
            "totacctbal": pa.array(tot[nz] / 100.0, pa.float64()),
        })

    def join_q5_local_volume(sf_dir):
        """TPC-H Q5 shape (local supplier volume): revenue of 1997
        orders whose lineitem supplier shares the CUSTOMER's nation,
        per nation. Dimensions (customer, supplier, nation) are
        node-sized broadcasts; the windowed orders broadcast as a
        sorted (orderkey → customer-nation) map (the q12 pattern); ONE
        lineitem pass folds exact cents×bp partials per nation and only
        25 (nation, sum) rows shuffle."""
        import numpy as np
        import pyarrow as pa
        import pyarrow.compute as pc
        import pyarrow.parquet as _pq
        import ray
        import ray.data
        from ray.data.aggregate import Sum
        from debezium_incubator_ray.functions.kernels import (
            collect_table, sorted_lookup,
        )

        LO = np.datetime64("1997-01-01T00:00:00", "us").astype(np.int64)
        HI = np.datetime64("1998-01-01T00:00:00", "us").astype(np.int64)

        cust = _pq.read_table(
            os.path.join(sf_dir, "customer.parquet"),
            columns=["c_custkey", "c_nationkey"],
        )
        ck = cust["c_custkey"].to_numpy(zero_copy_only=False).astype(
            np.int64)
        co = np.argsort(ck)
        cnat = cust["c_nationkey"].to_numpy(
            zero_copy_only=False).astype(np.int64)[co]
        cks = ck[co]
        sup = _pq.read_table(
            os.path.join(sf_dir, "supplier.parquet"),
            columns=["s_suppkey", "s_nationkey"],
        )
        sk = sup["s_suppkey"].to_numpy(zero_copy_only=False).astype(
            np.int64)
        so = np.argsort(sk)
        sup_ref = ray.put((sk[so], sup["s_nationkey"].to_numpy(
            zero_copy_only=False).astype(np.int64)[so]))

        orders = ray.data.read_parquet(
            os.path.join(sf_dir, "orders.parquet"),
            columns=["o_orderkey", "o_custkey", "o_orderdate"],
        )

        def opart(t: pa.Table) -> pa.Table:
            od = t["o_orderdate"].combine_chunks().cast(
                pa.int64()).to_numpy(zero_copy_only=False)
            t = t.filter(pa.array((od >= LO) & (od < HI)))
            okv = t["o_orderkey"].combine_chunks().to_numpy(
                zero_copy_only=False).astype(np.int64)
            cust_k = t["o_custkey"].combine_chunks().to_numpy(
                zero_copy_only=False).astype(np.int64)
            pos, found = sorted_lookup(cks, cust_k)
            return pa.table({
                "ok": pa.array(okv[found], pa.int64()),
                "nat": pa.array(cnat[pos[found]], pa.int64()),
            })

        ot = collect_table(orders.map_batches(
            opart, batch_format="pyarrow", zero_copy_batch=True,
        ), empty=pa.table({"ok": pa.array([], pa.int64()),
                           "nat": pa.array([], pa.int64())}))
        okv = ot["ok"].to_numpy(zero_copy_only=False)
        oo = np.argsort(okv)
        ord_ref = ray.put((
            okv[oo],
            ot["nat"].to_numpy(zero_copy_only=False)[oo],
        ))

        li = ray.data.read_parquet(
            os.path.join(sf_dir, "lineitem.parquet"),
            columns=["l_orderkey", "l_suppkey", "l_extendedprice",
                     "l_discount"],
        )
        EMPTY = pa.table({"nat": pa.array([], pa.int64()),
                          "rev": pa.array([], pa.int64())})

        def lpart(t: pa.Table) -> pa.Table:
            okk, onat = ray.get(ord_ref)
            skk, snat = ray.get(sup_ref)
            if t.num_rows == 0 or len(okk) == 0 or len(skk) == 0:
                return EMPTY
            lo = t["l_orderkey"].combine_chunks().to_numpy(
                zero_copy_only=False).astype(np.int64)
            ls = t["l_suppkey"].combine_chunks().to_numpy(
                zero_copy_only=False).astype(np.int64)
            op_, of = sorted_lookup(okk, lo)
            sp_, sf = sorted_lookup(skk, ls)
            m = of & sf
            m &= np.where(
                m, onat[np.clip(op_, 0, len(onat) - 1)]
                == snat[np.clip(sp_, 0, len(snat) - 1)], False)
            if not m.any():
                return EMPTY
            t = t.filter(pa.array(m))
            price_c = pc.cast(
                pc.round(pc.multiply(t["l_extendedprice"], 100.0)),
                pa.int64()).to_numpy(zero_copy_only=False)
            disc_bp = pc.cast(
                pc.round(pc.multiply(t["l_discount"], 100.0)),
                pa.int64()).to_numpy(zero_copy_only=False)
            nat = onat[op_[m]]
            rev = price_c * (100 - disc_bp)
            sums = np.zeros(25, np.int64)
            np.add.at(sums, nat, rev)
            nz = np.nonzero(sums)[0]
            return pa.table({
                "nat": pa.array(nz, pa.int64()),
                "rev": pa.array(sums[nz], pa.int64()),
            })

        g = (
            li.map_batches(lpart, batch_format="pyarrow",
                           zero_copy_batch=True)
            .groupby("nat").aggregate(Sum("rev", alias_name="rev"))
        )
        t = collect_table(g, empty=EMPTY)
        nt = _pq.read_table(os.path.join(sf_dir, "nation.parquet"),
                            columns=["n_nationkey", "n_name"])
        nk = nt["n_nationkey"].to_numpy(zero_copy_only=False).astype(
            np.int64)
        no = np.argsort(nk)
        nat_v = t["nat"].to_numpy(zero_copy_only=False).astype(np.int64)
        pos, found = sorted_lookup(nk[no], nat_v)
        t = t.filter(pa.array(found))
        return pa.table({
            "n_name": nt["n_name"].take(pa.array(no[pos[found]])),
            "revenue": pa.array(
                [((int(v) + 50) // 100) / 100.0
                 for v in t["rev"].to_pylist()], pa.float64()),
        })

    def join_q17_small_qty_revenue(sf_dir):
        """TPC-H Q17 shape (small-quantity-order revenue): total price
        of Brand#13 lineitems whose quantity is below 20% of that
        part's average quantity, divided by 7 ('average yearly
        revenue'). Quantities are integral, so the below-average filter
        cross-multiplies exactly (5·q·cnt < Σq — no float mean); the
        per-part (Σq, cnt) stats come from one pre-aggregated pass over
        only the brand's lines (part dimension broadcast) and the
        revenue folds in exact cents."""
        import numpy as np
        import pyarrow as pa
        import pyarrow.compute as pc
        import pyarrow.parquet as _pq
        import ray
        import ray.data
        from ray.data.aggregate import Sum
        from debezium_incubator_ray.functions.kernels import (
            collect_table, sorted_lookup,
        )

        pt = _pq.read_table(
            os.path.join(sf_dir, "part.parquet"),
            columns=["p_partkey", "p_brand"],
        )
        pk = pt.filter(pc.equal(pt["p_brand"], "Brand#13"))[
            "p_partkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        brand_ref = ray.put(np.sort(pk))

        li = ray.data.read_parquet(
            os.path.join(sf_dir, "lineitem.parquet"),
            columns=["l_partkey", "l_quantity", "l_extendedprice"],
        )
        EMPTY = pa.table({
            "l_partkey": pa.array([], pa.int64()),
            "qi": pa.array([], pa.int64()),
            "n": pa.array([], pa.int64()),
            "cents": pa.array([], pa.int64()),
        })

        def lpart(t: pa.Table) -> pa.Table:
            """Per-batch partial per part: (Σq, cnt) over ALL brand
            lines plus the price-cents sum KEYED BY (part, qty) — kept
            as per-(part, qi) rows so the final below-average filter
            can run once the global (Σq, cnt) is known."""
            bp = ray.get(brand_ref)
            if t.num_rows == 0 or len(bp) == 0:
                return EMPTY
            lp = t["l_partkey"].combine_chunks().to_numpy(
                zero_copy_only=False).astype(np.int64)
            pos, found = sorted_lookup(bp, lp)
            t = t.filter(pa.array(found))
            if t.num_rows == 0:
                return EMPTY
            g = pa.table({
                "l_partkey": t["l_partkey"].combine_chunks().cast(
                    pa.int64()),
                "qi": pc.cast(pc.round(t["l_quantity"]), pa.int64()),
                "n": pa.array(np.ones(t.num_rows, np.int64)),
                "cents": pc.cast(
                    pc.round(pc.multiply(t["l_extendedprice"], 100.0)),
                    pa.int64()),
            }).group_by(["l_partkey", "qi"]).aggregate(
                [("n", "sum"), ("cents", "sum")])
            return pa.table({
                "l_partkey": g["l_partkey"], "qi": g["qi"],
                "n": g["n_sum"], "cents": g["cents_sum"],
            })

        rows = collect_table(
            li.map_batches(lpart, batch_format="pyarrow",
                           zero_copy_batch=True),
            empty=EMPTY,
        )
        # driver fold over (part, qty) cells — bounded by
        # |brand parts| × 50 distinct quantities, dimension-sized
        lpk = rows["l_partkey"].to_numpy(zero_copy_only=False)
        qi = rows["qi"].to_numpy(zero_copy_only=False)
        n = rows["n"].to_numpy(zero_copy_only=False)
        cents = rows["cents"].to_numpy(zero_copy_only=False)
        if len(lpk) == 0:
            return pa.table({"avg_yearly": pa.array([None],
                                                    pa.float64())})
        order = np.argsort(lpk, kind="stable")
        ps = lpk[order]
        uniq, starts = np.unique(ps, return_index=True)
        sq = np.add.reduceat((qi * n)[order], starts)
        cnt = np.add.reduceat(n[order], starts)
        # map each cell back to its part's global (Σq, cnt)
        pos = np.searchsorted(uniq, lpk)
        small = 5 * qi * cnt[pos] < sq[pos]
        total = int(cents[small].sum())
        if not small.any():
            return pa.table({"avg_yearly": pa.array([None],
                                                    pa.float64())})
        return pa.table({
            "avg_yearly": pa.array([float(total) / 700.0], pa.float64()),
        })

    def join_q4_order_priority(sf_dir):
        """TPC-H Q4 shape (order-priority checking): orders placed in
        1997-Q3 with at least one LATE lineitem — shipped more than 60
        days after the order date (this corpus has no commit/receipt
        dates, so ship-lag stands in) — counted per priority. The
        WINDOWED orders project to a broadcast sorted (orderkey, date,
        priority-idx) triple (window-bounded, the q12 broadcast
        pattern); one lineitem pass emits each late order at most once
        per batch and the tiny distinct set resolves driver-side
        (bounded by the 3-month window)."""
        import numpy as np
        import pyarrow as pa
        import pyarrow.compute as pc
        import ray
        import ray.data
        from debezium_incubator_ray.functions.kernels import (
            collect_table, sorted_lookup,
        )

        LO = np.datetime64("1997-07-01T00:00:00", "us").astype(np.int64)
        HI = np.datetime64("1997-10-01T00:00:00", "us").astype(np.int64)
        LATE_US = 60 * 86_400 * 1_000_000

        PRI = ["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED",
               "5-LOW"]
        orders = ray.data.read_parquet(
            os.path.join(sf_dir, "orders.parquet"),
            columns=["o_orderkey", "o_orderdate", "o_orderpriority"],
        )

        def opart(t: pa.Table) -> pa.Table:
            od = t["o_orderdate"].combine_chunks().cast(
                pa.int64()).to_numpy(zero_copy_only=False)
            t = t.filter(pa.array((od >= LO) & (od < HI)))
            idx = pc.index_in(t["o_orderpriority"],
                              value_set=pa.array(PRI))
            if t.num_rows and pc.any(pc.is_null(idx)).as_py():
                # fail loud: a priority outside the known set would
                # silently misattribute counts through the int codes
                raise ValueError(
                    "o_orderpriority outside the known value set"
                )
            return pa.table({
                "ok": t["o_orderkey"].combine_chunks().cast(pa.int64()),
                "od": t["o_orderdate"].combine_chunks().cast(pa.int64()),
                "pi": pc.cast(idx, pa.int8()),
            })

        ot = collect_table(orders.map_batches(
            opart, batch_format="pyarrow", zero_copy_batch=True,
        ), empty=pa.table({"ok": pa.array([], pa.int64()),
                           "od": pa.array([], pa.int64()),
                           "pi": pa.array([], pa.int8())}))
        ok = ot["ok"].to_numpy(zero_copy_only=False)
        o = np.argsort(ok)
        ord_ref = ray.put((
            ok[o],
            ot["od"].to_numpy(zero_copy_only=False)[o],
            ot["pi"].to_numpy(zero_copy_only=False).astype(np.int64)[o],
        ))

        li = ray.data.read_parquet(
            os.path.join(sf_dir, "lineitem.parquet"),
            columns=["l_orderkey", "l_shipdate"],
        )
        EMPTY = pa.table({"okey": pa.array([], pa.int64())})

        def lpart(t: pa.Table) -> pa.Table:
            okk, odd, _ = ray.get(ord_ref)
            if len(okk) == 0 or t.num_rows == 0:
                return EMPTY
            lo = t["l_orderkey"].combine_chunks().to_numpy(
                zero_copy_only=False).astype(np.int64)
            ship = t["l_shipdate"].combine_chunks().cast(
                pa.int64()).to_numpy(zero_copy_only=False)
            pos, found = sorted_lookup(okk, lo)
            late = found & (ship > odd[np.clip(pos, 0, len(odd) - 1)]
                            + LATE_US)
            return pa.table({
                "okey": pa.array(np.unique(lo[late]), pa.int64()),
            })

        parts = collect_table(li.map_batches(
            lpart, batch_format="pyarrow", zero_copy_batch=True,
        ), empty=EMPTY)
        okk, odd, pii = ray.get(ord_ref)
        uniq = np.unique(parts["okey"].to_numpy(zero_copy_only=False))
        if len(uniq):
            pos, found = sorted_lookup(okk, uniq)
            counts = np.bincount(pii[pos[found]], minlength=len(PRI))
        else:
            counts = np.zeros(len(PRI), np.int64)
        keep = counts > 0
        return pa.table({
            "o_orderpriority": pa.array(
                [p for p, k in zip(PRI, keep) if k], pa.string()),
            "order_count": pa.array(counts[keep], pa.int64()),
        })

    def join_q18_large_orders(sf_dir):
        """TPC-H Q18 shape (large-volume orders): orders whose total
        lineitem quantity exceeds 220 (quantities are integral — the
        per-order fold is exact int64), with customer/price attributes.
        Per-batch pre-aggregation bounds the shuffle to (orderkey, qty)
        partials; the qualifying keys are the far tail of the
        distribution (KBs) and broadcast into one orders pass — the
        broadcast-semijoin precedent."""
        import numpy as np
        import pyarrow as pa
        import pyarrow.compute as pc
        import ray
        import ray.data
        from ray.data.aggregate import Sum
        from debezium_incubator_ray.functions.kernels import (
            collect_table, sorted_lookup,
        )

        li = ray.data.read_parquet(
            os.path.join(sf_dir, "lineitem.parquet"),
            columns=["l_orderkey", "l_quantity"],
        )

        def lpart(t: pa.Table) -> pa.Table:
            g = pa.table({
                "l_orderkey": t["l_orderkey"].combine_chunks().cast(
                    pa.int64()),
                "q": pc.cast(pc.round(t["l_quantity"]), pa.int64()),
            }).group_by(["l_orderkey"]).aggregate([("q", "sum")])
            return pa.table({
                "l_orderkey": g["l_orderkey"], "q": g["q_sum"],
            })

        agg = (
            li.map_batches(lpart, batch_format="pyarrow",
                           zero_copy_batch=True)
            .groupby("l_orderkey").aggregate(Sum("q", alias_name="q"))
        )
        t = collect_table(agg, empty=pa.table({
            "l_orderkey": pa.array([], pa.int64()),
            "q": pa.array([], pa.int64()),
        }))
        qv = t["q"].to_numpy(zero_copy_only=False)
        t = t.filter(pa.array(qv > 220))
        qk = t["l_orderkey"].to_numpy(zero_copy_only=False).astype(
            np.int64)
        o = np.argsort(qk)
        big_ref = ray.put((
            qk[o], t["q"].to_numpy(zero_copy_only=False)[o]))

        orders = ray.data.read_parquet(
            os.path.join(sf_dir, "orders.parquet"),
            columns=["o_orderkey", "o_custkey", "o_totalprice"],
        )
        EMPTY = pa.table({
            "o_orderkey": pa.array([], pa.int64()),
            "o_custkey": pa.array([], pa.int64()),
            "o_totalprice": pa.array([], pa.float64()),
            "sum_qty": pa.array([], pa.int64()),
        })

        def opart(t2: pa.Table) -> pa.Table:
            kk, qq = ray.get(big_ref)
            if len(kk) == 0 or t2.num_rows == 0:
                return EMPTY
            okv = t2["o_orderkey"].combine_chunks().to_numpy(
                zero_copy_only=False).astype(np.int64)
            pos, found = sorted_lookup(kk, okv)
            t2 = t2.filter(pa.array(found))
            return pa.table({
                "o_orderkey": t2["o_orderkey"].combine_chunks().cast(
                    pa.int64()),
                "o_custkey": t2["o_custkey"].combine_chunks().cast(
                    pa.int64()),
                "o_totalprice": t2["o_totalprice"],
                "sum_qty": pa.array(qq[pos[found]], pa.int64()),
            })

        return orders.map_batches(opart, batch_format="pyarrow",
                                  zero_copy_batch=True)

    def join_q16_supplier_cnt(sf_dir):
        """TPC-H Q16 shape (supplier diversity per part class): distinct
        supplier count per (brand, type, size) over lineitem-observed
        part-supplier pairs (this corpus has no partsupp — lineitem IS
        the observed relationship), excluding Brand#1 / MEDIUM / sizes
        outside the probe set. Part attributes broadcast once (the part
        dimension is node-sized; at true scale this cuts over to the
        shared shuffle join); the (attrs, suppkey) distinct runs
        through distinct_rows' one bucketed shuffle keyed on brand, and
        the per-class count folds in-bucket."""
        import numpy as np
        import pyarrow as pa
        import pyarrow.compute as pc
        import pyarrow.parquet as _pq
        import ray
        import ray.data
        from ray.data.aggregate import Sum
        from debezium_incubator_ray.functions.graph import distinct_rows
        from debezium_incubator_ray.functions.kernels import (
            collect_table, sorted_lookup,
        )

        SIZES = (1, 4, 9, 14, 19, 23, 36, 45)

        pt = _pq.read_table(
            os.path.join(sf_dir, "part.parquet"),
            columns=["p_partkey", "p_brand", "p_type", "p_size"],
        )
        keep = pc.and_(
            pc.and_(pc.not_equal(pt["p_brand"], "Brand#1"),
                    pc.not_equal(pt["p_type"], "MEDIUM")),
            pc.is_in(pt["p_size"],
                     value_set=pa.array(list(SIZES), pa.int64())),
        )
        pt = pt.filter(keep)
        pk = pt["p_partkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        o = np.argsort(pk)
        pt = pt.take(pa.array(o))
        pk_ref = ray.put((pk[o], pt["p_brand"], pt["p_type"],
                          pt["p_size"]))

        li = ray.data.read_parquet(
            os.path.join(sf_dir, "lineitem.parquet"),
            columns=["l_partkey", "l_suppkey"],
        )
        EMPTY = pa.table({
            "p_brand": pa.array([], pa.string()),
            "p_type": pa.array([], pa.string()),
            "p_size": pa.array([], pa.int64()),
            "l_suppkey": pa.array([], pa.int64()),
        })

        def attach(t: pa.Table) -> pa.Table:
            pkk, br, ty, sz = ray.get(pk_ref)
            if len(pkk) == 0 or t.num_rows == 0:
                return EMPTY
            lp = t["l_partkey"].combine_chunks().to_numpy(
                zero_copy_only=False).astype(np.int64)
            pos, keep = sorted_lookup(pkk, lp)
            if not keep.any():
                return EMPTY
            idx = pa.array(pos[keep])
            return pa.table({
                "p_brand": br.take(idx),
                "p_type": ty.take(idx),
                "p_size": sz.take(idx).cast(pa.int64()),
                "l_suppkey": t["l_suppkey"].combine_chunks().cast(
                    pa.int64()).filter(pa.array(keep)),
            })

        pairs = distinct_rows(
            li.map_batches(attach, batch_format="pyarrow",
                           zero_copy_batch=True),
            ["p_brand", "p_type", "p_size", "l_suppkey"],
        )

        def cpart(t: pa.Table) -> pa.Table:
            g = t.group_by(["p_brand", "p_type", "p_size"]).aggregate(
                [("l_suppkey", "count")])
            return pa.table({
                "p_brand": g["p_brand"],
                "p_type": g["p_type"],
                "p_size": g["p_size"],
                "supplier_cnt": g["l_suppkey_count"].cast(pa.int64()),
            })

        g = (
            pairs.map_batches(cpart, batch_format="pyarrow",
                              zero_copy_batch=True)
            .groupby(["p_brand", "p_type", "p_size"])
            .aggregate(Sum("supplier_cnt", alias_name="supplier_cnt"))
        )
        return collect_table(g, empty=pa.table({
            "p_brand": pa.array([], pa.string()),
            "p_type": pa.array([], pa.string()),
            "p_size": pa.array([], pa.int64()),
            "supplier_cnt": pa.array([], pa.int64()),
        }))

    def join_q19_disjunctive(sf_dir):
        """TPC-H Q19 shape (disjunctive brand/size/quantity predicates):
        one scalar revenue over the OR of three (brand, size range,
        quantity range) branches. Part (brand-code, size) broadcast as
        parallel arrays; the whole disjunction evaluates as three
        vectorized masks per batch — no row loop, no join; per-batch
        one-row partials fold driver-side in exact integer cents."""
        import numpy as np
        import pyarrow as pa
        import pyarrow.compute as pc
        import pyarrow.parquet as _pq
        import ray
        import ray.data
        from debezium_incubator_ray.functions.kernels import (
            collect_table, sorted_lookup,
        )

        BRANCHES = (
            ("Brand#12", 1, 11, 1, 5),
            ("Brand#23", 10, 20, 1, 10),
            ("Brand#34", 20, 30, 1, 15),
        )

        pt = _pq.read_table(
            os.path.join(sf_dir, "part.parquet"),
            columns=["p_partkey", "p_brand", "p_size"],
        )
        brands = [b[0] for b in BRANCHES]
        bcode = np.full(pt.num_rows, -1, np.int64)
        for i, b in enumerate(brands):
            bcode[pc.equal(pt["p_brand"], b).to_numpy(
                zero_copy_only=False)] = i
        pk = pt["p_partkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        sz = pt["p_size"].to_numpy(zero_copy_only=False).astype(np.int64)
        o = np.argsort(pk)
        pk_ref = ray.put((pk[o], bcode[o], sz[o]))

        li = ray.data.read_parquet(
            os.path.join(sf_dir, "lineitem.parquet"),
            columns=["l_partkey", "l_quantity", "l_extendedprice",
                     "l_discount"],
        )
        EMPTY = pa.table({"rev_cbp": pa.array([], pa.int64()),
                          "n": pa.array([], pa.int64())})

        def lpart(t: pa.Table) -> pa.Table:
            pkk, bc, szz = ray.get(pk_ref)
            if len(pkk) == 0 or t.num_rows == 0:
                return EMPTY
            lp = t["l_partkey"].combine_chunks().to_numpy(
                zero_copy_only=False).astype(np.int64)
            pos, hit = sorted_lookup(pkk, lp)
            code = np.where(hit, bc[pos], -1)
            size = np.where(hit, szz[pos], 0)
            # half-away rounding to match DuckDB round() on exact .5
            # quantities (pc.round defaults to half-even)
            qty = pc.cast(
                pc.round(t["l_quantity"], 0,
                         round_mode="half_towards_infinity"),
                pa.int64()).to_numpy(zero_copy_only=False)
            keep = np.zeros(len(lp), bool)
            for i, (_, qlo, qhi, slo, shi) in enumerate(BRANCHES):
                keep |= ((code == i) & (qty >= qlo) & (qty <= qhi)
                         & (size >= slo) & (size <= shi))
            if not keep.any():
                return EMPTY
            t = t.filter(pa.array(keep))
            price_c = pc.cast(
                pc.round(pc.multiply(t["l_extendedprice"], 100.0)),
                pa.int64()).to_numpy(zero_copy_only=False)
            disc_bp = pc.cast(
                pc.round(pc.multiply(t["l_discount"], 100.0)),
                pa.int64()).to_numpy(zero_copy_only=False)
            return pa.table({
                "rev_cbp": pa.array(
                    [int(np.sum(price_c * (100 - disc_bp)))], pa.int64()),
                "n": pa.array([t.num_rows], pa.int64()),
            })

        t = collect_table(
            li.map_batches(lpart, batch_format="pyarrow",
                           zero_copy_batch=True),
            empty=EMPTY,
        )
        n = int(np.sum(t["n"].to_numpy(zero_copy_only=False))) \
            if t.num_rows else 0
        if n == 0:
            # SQL SUM over zero rows is NULL (the row still exists)
            return pa.table({"revenue": pa.array([None], pa.float64())})
        total = int(np.sum(t["rev_cbp"].to_numpy(zero_copy_only=False)))
        return pa.table({
            "revenue": pa.array([(total + 50) // 100 / 100.0],
                                pa.float64()),
        })

    return {
        "cdc_lww_state": cdc_lww_state,
        "cdc_partial_updates": cdc_partial_updates,
        "cdc_partial_blacklist": cdc_partial_blacklist,
        "cdc_partial_evolution": cdc_partial_evolution,
        "cdc_partial_mor": cdc_partial_mor,
        "cdc_counter_col": cdc_counter_col,
        "cdc_range_erase": cdc_range_erase,
        "cdc_truncate": cdc_truncate,
        "cdc_replay_dup": cdc_replay_dup,
        "cdc_restart_resume": cdc_restart_resume,
        "cdc_snapshot_handoff": cdc_snapshot_handoff,
        "cdc_snapshot_filter": cdc_snapshot_filter,
        "cdc_field_blacklist": cdc_field_blacklist,
        "cdc_column_mask": cdc_column_mask,
        "cdc_column_truncate": cdc_column_truncate,
        "cdc_flatten_rewrite": cdc_flatten_rewrite,
        "cdc_flatten_drop": cdc_flatten_drop,
        "cdc_table_filter": cdc_table_filter,
        "cdc_error_quarantine": cdc_error_quarantine,
        "cdc_segment_archive": cdc_segment_archive,
        "cdc_reshard": cdc_reshard,
        "cdc_lake_clone": cdc_lake_clone,
        "cdc_json_envelopes": cdc_json_envelopes,
        "cdc_predicate_update": cdc_predicate_update,
        "cdc_merge_into": cdc_merge_into,
        "cdc_tombstones": cdc_tombstones,
        "cdc_watermarks": cdc_watermarks,
        "cdc_changelog_counts": cdc_changelog_counts,
        "cdc_before_images": cdc_before_images,
        "cdc_changed_columns": cdc_changed_columns,
        "cdc_partition_skew": cdc_partition_skew,
        "cdc_snapshot_read": cdc_snapshot_read,
        "cdc_schema_evolution": cdc_schema_evolution,
        "cdc_schema_evolution_ddl": cdc_schema_evolution_ddl,
        "cdc_schema_create_ddl": cdc_schema_create_ddl,
        "cdc_schema_widen": cdc_schema_widen,
        "cdc_schema_drop": cdc_schema_drop,
        "cdc_schema_rename": cdc_schema_rename,
        "cdc_multi_table": cdc_multi_table,
        "cdc_outbox": cdc_outbox,
        "cdc_compaction": cdc_compaction,
        "cdc_mor_lww": cdc_mor_lww,
        "cdc_time_travel": cdc_time_travel,
        "cdc_incremental_snapshot": cdc_incremental_snapshot,
        "cdc_changelog_diff": cdc_changelog_diff,
        "cdc_point_lookup": cdc_point_lookup,
        "cdc_latest_only": cdc_latest_only,
        "cdc_tombstone_retain": cdc_tombstone_retain,
        "cdc_tombstone_purge": cdc_tombstone_purge,
        "type_normalization": type_normalization,
        "type_normalization_ltz": type_normalization_ltz,
        "type_normalization_nested": type_normalization_nested,
        "row_scoped_max": row_scoped_max,
        "agg_presum_groupby": agg_presum_groupby,
        "windowed_agg": windowed_agg,
        "windowed_session_agg": windowed_session_agg,
        "events_conversion_window": events_conversion_window,
        "events_rolling_distinct": events_rolling_distinct,
        "events_stickiness": events_stickiness,
        "dq_chi2_independence": dq_chi2_independence,
        "stats_spearman": stats_spearman,
        "stats_ks_test": stats_ks_test,
        "stats_kendall_tau": stats_kendall_tau,
        "stats_mann_whitney": stats_mann_whitney,
        "events_autocorr": events_autocorr,
        "events_gini": events_gini,
        "orders_value_gini": orders_value_gini,
        "lineitem_q6_revenue": lineitem_q6_revenue,
        "lineitem_q1_pricing": lineitem_q1_pricing,
        "join_q3_shipping": join_q3_shipping,
        "stats_cramers_v": stats_cramers_v,
        "stats_cohens_d": stats_cohens_d,
        "embedding_silhouette": embedding_silhouette,
        "graph_jaccard_neighbors": graph_jaccard_neighbors,
        "text_flesch_hist": text_flesch_hist,
        "text_js_divergence": text_js_divergence,
        "stats_hellinger": stats_hellinger,
        "events_dow_hour_heatmap": events_dow_hour_heatmap,
        "dedup_semantic": dedup_semantic,
        "docs_dsir_weights": docs_dsir_weights,
        "graph_modularity": graph_modularity,
        "graph_degree_hist": graph_degree_hist,
        "join_q10_returns": join_q10_returns,
        "join_q14_promo": join_q14_promo,
        "text_unigram_entropy": text_unigram_entropy,
        "multimodal_pixel_stats": multimodal_pixel_stats,
        "multimodal_jpeg_stats": multimodal_jpeg_stats,
        "multimodal_webp_meta": multimodal_webp_meta,
        "dedup_phash_groups": dedup_phash_groups,
        "text_fertility_by_lang": text_fertility_by_lang,
        "docs_length_by_lang_quantiles": docs_length_by_lang_quantiles,
        "events_stl_decomposition": events_stl_decomposition,
        "dedup_threshold_curve": dedup_threshold_curve,
        "events_window_dedup": events_window_dedup,
        "events_decayed_engagement": events_decayed_engagement,
        "events_touch_attribution": events_touch_attribution,
        "events_holt_backtest": events_holt_backtest,
        "part_price_volume_bridge": part_price_volume_bridge,
        "orders_duplicate_invoices": orders_duplicate_invoices,
        "dedup_minhash_index": dedup_minhash_index,
        "dedup_tile_coverage": dedup_tile_coverage,
        "join_q7_volume": join_q7_volume,
        "join_q8_market_share": join_q8_market_share,
        "join_q9_profit": join_q9_profit,
        "join_q12_priority_class": join_q12_priority_class,
        "join_q13_custdist": join_q13_custdist,
        "join_q15_top_supplier": join_q15_top_supplier,
        "join_q2_min_cost_supplier": join_q2_min_cost_supplier,
        "join_q20_dominant_supplier": join_q20_dominant_supplier,
        "join_q11_important_parts": join_q11_important_parts,
        "join_q21_waiting_supplier": join_q21_waiting_supplier,
        "join_q22_global_sales": join_q22_global_sales,
        "join_q5_local_volume": join_q5_local_volume,
        "join_q17_small_qty_revenue": join_q17_small_qty_revenue,
        "join_q4_order_priority": join_q4_order_priority,
        "join_q18_large_orders": join_q18_large_orders,
        "join_q16_supplier_cnt": join_q16_supplier_cnt,
        "join_q19_disjunctive": join_q19_disjunctive,
        "orders_qoq_growth": orders_qoq_growth,
        "embedding_intrinsic_dim": embedding_intrinsic_dim,
        "text_bm25_index_topk": text_bm25_index_topk,
        "events_changepoint": events_changepoint,
        "join_bloom_semi": join_bloom_semi,
        "join_min_price_supplier": join_min_price_supplier,
        "join_small_qty_revenue": join_small_qty_revenue,
        "join_large_qty_orders": join_large_qty_orders,
        "part_association_rules": part_association_rules,
        "events_daily_ohlc": events_daily_ohlc,
        "dq_candidate_keys": dq_candidate_keys,
        "text_gopher_rules": text_gopher_rules,
        "topk_per_group": topk_per_group,
        "topk_per_user": topk_per_user,
        "quantiles_by_type": quantiles_by_type,
        "asof_join_events": asof_join_events,
        "events_in_sessions": events_in_sessions,
        "dedup_exact": dedup_exact,
        "dedup_exact_semijoin": dedup_exact_semijoin,
        "dedup_embedding": dedup_embedding,
        "dedup_embedding_lsh": dedup_embedding_lsh,
        "dedup_minhash": dedup_minhash,
        "dedup_simhash": dedup_simhash,
        "dedup_ngram_jaccard": dedup_ngram_jaccard,
        "dedup_containment": dedup_containment,
        "text_ngram_novelty": text_ngram_novelty,
        "stats_multi_regression": stats_multi_regression,
        "sample_neyman": sample_neyman,
        "dedup_clusters": dedup_clusters,
        "dedup_keep_best": dedup_keep_best,
        "dedup_keep_best_shuffle": dedup_keep_best_shuffle,
        "multimodal_decode": multimodal_decode,
        "docs_hash_split": docs_hash_split,
        "events_watermark_late": events_watermark_late,
        "text_heavy_hitters": text_heavy_hitters,
        "events_hll_by_type": events_hll_by_type,
        "dedup_minhash_estimate": dedup_minhash_estimate,
        "docs_shingle_df_histogram": docs_shingle_df_histogram,
        "dedup_survivorship": dedup_survivorship,
        "dedup_substring_rate": dedup_substring_rate,
        "embedding_norm_histogram": embedding_norm_histogram,
        "events_burstiness": events_burstiness,
        "events_session_count_hist": events_session_count_hist,
        "embedding_centroid_angle_hist": embedding_centroid_angle_hist,
        "docs_split_balance": docs_split_balance,
        "orders_basket_size_hist": orders_basket_size_hist,
        "cdc_reactivation_rate": cdc_reactivation_rate,
        "text_token_len_histogram": text_token_len_histogram,
        "windowed_agg_on_time": windowed_agg_on_time,
        "docs_resumable_write": docs_resumable_write,
        "dedup_cross_split_leakage": dedup_cross_split_leakage,
        "cdc_secondary_index": cdc_secondary_index,
        "cdc_prefix_lookup": cdc_prefix_lookup,
        "cdc_key_range_scan": cdc_key_range_scan,
        "cdc_fan_in": cdc_fan_in,
        "cdc_row_expiry": cdc_row_expiry,
        "cdc_materialized_view": cdc_materialized_view,
        "cdc_zone_scan": cdc_zone_scan,
        "cdc_lake_join": cdc_lake_join,
        "cdc_join_view": cdc_join_view,
        "cdc_snapshot_join": cdc_snapshot_join,
        "cdc_enriched_view": cdc_enriched_view,
        "cdc_key_erasure": cdc_key_erasure,
        "cdc_transactional": cdc_transactional,
        "cdc_pk_update": cdc_pk_update,
        "cdc_tx_summary": cdc_tx_summary,
        "cdc_constraint_filter": cdc_constraint_filter,
        "cdc_dead_letters": cdc_dead_letters,
        "cdc_composite_key": cdc_composite_key,
        "cdc_incremental_agg": cdc_incremental_agg,
        "docs_curation_pipeline": docs_curation_pipeline,
        "embedding_normalize": embedding_normalize,
        "windowed_hopping_agg": windowed_hopping_agg,
        "text_repetition": text_repetition,
        "text_pii_redact": text_pii_redact,
        "text_line_dedup": text_line_dedup,
        "url_canonicalize": url_canonicalize,
        "url_domain_stats": url_domain_stats,
        "text_token_count": text_token_count,
        "text_quality": text_quality,
        "text_lang_id": text_lang_id,
        "text_lang_mismatch": text_lang_mismatch,
        "text_lang_confusion": text_lang_confusion,
        "text_fingerprint": text_fingerprint,
        "text_tfidf_topterms": text_tfidf_topterms,
        "sample_stratified": sample_stratified,
        "docs_quality_filter": docs_quality_filter,
        "seq_packing": seq_packing,
        "text_decontaminate": text_decontaminate,
        "dedup_incremental": dedup_incremental,
        "docs_top_quantile": docs_top_quantile,
        "url_best_dedup": url_best_dedup,
        "sample_fixed_k": sample_fixed_k,
        "sample_domain_quota": sample_domain_quota,
        "join_broadcast_enrich": join_broadcast_enrich,
        "join_shuffle_revenue": join_shuffle_revenue,
        "join_salted_revenue": join_salted_revenue,
        "events_funnel": events_funnel,
        "cdc_scd2_history": cdc_scd2_history,
        "events_running_total": events_running_total,
        "events_anomaly": events_anomaly,
        "text_unigram_logprob": text_unigram_logprob,
        "text_bigram_logprob": text_bigram_logprob,
        "events_props_extract": events_props_extract,
        "docs_ccnet_buckets": docs_ccnet_buckets,
        "text_inverted_index": text_inverted_index,
        "docs_chunking": docs_chunking,
        "sample_split_assign": sample_split_assign,
        "distinct_users_per_type": distinct_users_per_type,
        "corpus_token_stats": corpus_token_stats,
        "text_normalize": text_normalize,
        "source_jsonl": source_jsonl,
        "source_csv": source_csv,
        "dq_fk_orphans": dq_fk_orphans,
        "dq_profile": dq_profile,
        "approx_distinct_users": approx_distinct_users,
        "multimodal_frames": multimodal_frames,
        "sample_language_mix": sample_language_mix,
        "ann_brute_topk": ann_brute_topk,
        "ann_lsh_topk": ann_lsh_topk,
        "ann_recall_eval": ann_recall_eval,
        "ann_ivf_topk": ann_ivf_topk,
        "ann_ivf_index_topk": ann_ivf_index_topk,
        "embedding_kmeans": embedding_kmeans,
        "multimodal_meta": multimodal_meta,
        "embedding_gram": embedding_gram,
        "embedding_covariance": embedding_covariance,
        "text_bigram_topk": text_bigram_topk,
        "events_retention_cohorts": events_retention_cohorts,
        "events_pivot_profile": events_pivot_profile,
        "join_top_revenue_orders": join_top_revenue_orders,
        "part_copurchase_topk": part_copurchase_topk,
        "corpus_shuffle_head": corpus_shuffle_head,
        "join_regional_revenue": join_regional_revenue,
        "dq_psi_drift": dq_psi_drift,
        "sample_weighted_topk": sample_weighted_topk,
        "events_markov_transitions": events_markov_transitions,
        "events_transition_entropy": events_transition_entropy,
        "events_trigram_paths": events_trigram_paths,
        "events_rollup": events_rollup,
        "events_cube": events_cube,
        "events_lag_gaps": events_lag_gaps,
        "events_peak_window": events_peak_window,
        "events_argmax_ties": events_argmax_ties,
        "spend_above_avg": spend_above_avg,
        "text_zipf_slope": text_zipf_slope,
        "text_bm25_topk": text_bm25_topk,
        "dq_histogram": dq_histogram,
        "text_type_token_ratio": text_type_token_ratio,
        "events_path_signatures": events_path_signatures,
        "join_anti_customers": join_anti_customers,
        "join_range_price_tier": join_range_price_tier,
        "join_full_outer_daily": join_full_outer_daily,
        "join_semi_recent_orders": join_semi_recent_orders,
        "embedding_quantize_int8": embedding_quantize_int8,
        "text_hashed_features": text_hashed_features,
        "sample_per_group_k": sample_per_group_k,
        "events_type_entropy": events_type_entropy,
        "stats_regression_tax": stats_regression_tax,
        "dq_benford": dq_benford,
        "stats_group_means": stats_group_means,
        "events_first_touch": events_first_touch,
        "events_ewma": events_ewma,
        "stats_percent_rank": stats_percent_rank,
        "stats_dense_rank": stats_dense_rank,
        "dq_outliers_mad": dq_outliers_mad,
        "graph_pagerank": graph_pagerank,
        "graph_triangles": graph_triangles,
        "graph_local_clustering": graph_local_clustering,
        "graph_adamic_adar": graph_adamic_adar,
        "graph_kcore": graph_kcore,
        "text_heaps_law": text_heaps_law,
        "orders_late_ship": orders_late_ship,
        "events_rolling_median": events_rolling_median,
        "stats_brown_forsythe": stats_brown_forsythe,
        "cdc_incremental_distinct": cdc_incremental_distinct,
        "graph_label_prop": graph_label_prop,
        "orders_ship_lag_quantiles": orders_ship_lag_quantiles,
        "events_seasonal_backtest": events_seasonal_backtest,
        "stats_runs_test": stats_runs_test,
        "stats_hill_tail": stats_hill_tail,
        "part_abc_classes": part_abc_classes,
        "events_markov_stationary": events_markov_stationary,
        "events_dow_seasonality": events_dow_seasonality,
        "docs_length_lognormal": docs_length_lognormal,
        "text_source_vocab_overlap": text_source_vocab_overlap,
        "part_brand_hhi": part_brand_hhi,
        "graph_rich_club": graph_rich_club,
        "graph_assortativity": graph_assortativity,
        "graph_bfs_hops": graph_bfs_hops,
        "graph_connected_components": graph_connected_components,
        "dq_corr_matrix": dq_corr_matrix,
        "events_group_percent_rank": events_group_percent_rank,
        "events_top_user": events_top_user,
        "stats_higher_moments": stats_higher_moments,
        "stats_welch_ttest": stats_welch_ttest,
        "stats_anova_f": stats_anova_f,
        "stats_mutual_info": stats_mutual_info,
        "stats_theilsen_daily": stats_theilsen_daily,
        "events_survival_km": events_survival_km,
        "orders_cohort_ltv": orders_cohort_ltv,
        "approx_distinct_hll": approx_distinct_hll,
        "events_time_in_state": events_time_in_state,
        "events_peak_concurrency": events_peak_concurrency,
        "orders_rfm_segments": orders_rfm_segments,
        "text_cosine_pairs": text_cosine_pairs,
        "dq_reconcile_orders": dq_reconcile_orders,
        "events_new_users_daily": events_new_users_daily,
        "part_pareto_front": part_pareto_front,
        "text_pmi_topk": text_pmi_topk,
        "events_longest_streak": events_longest_streak,
        "events_type_overlap": events_type_overlap,
        "orders_churned_customers": orders_churned_customers,
        "dq_multivariate_outliers": dq_multivariate_outliers,
        "orders_backlog_curve": orders_backlog_curve,
        "stats_trimmed_means": stats_trimmed_means,
        "events_imputed_means": events_imputed_means,
        "events_minmax_scaled": events_minmax_scaled,
        "orders_decile_report": orders_decile_report,
        "stats_ntile": stats_ntile,
        "stats_global_quantiles": stats_global_quantiles,
        "stats_winsorized_means": stats_winsorized_means,
    }


# ---------------------------------------------------------------------------
# oracles

_ENV = (
    "SELECT user_id, event_id AS lsn, "
    "CASE WHEN event_id % 10 = 0 THEN 'd' "
    "WHEN event_id % 10 IN (1, 2) THEN 'c' ELSE 'u' END AS op, "
    "ts, event_type, value, props FROM events"
)

_LWW = (
    f"WITH env AS ({_ENV}), ranked AS ("
    "SELECT *, row_number() OVER (PARTITION BY user_id ORDER BY lsn DESC) AS rn "
    "FROM env) "
)

_TOKENS = (
    "CASE WHEN length(trim(text)) = 0 THEN 0 "
    "ELSE length(string_split_regex(trim(text), '\\s+')) END"
)


def _markov_stationary_sql(rounds: int = 8) -> str:
    """Unrolled power iteration v' = v*P over the row-normalized
    (prev, next) transition matrix — the same rounds the engine runs;
    states with no outgoing edges leak mass on both sides."""
    sql = (
        "WITH s AS (SELECT user_id, event_type, "
        "LAG(event_type) OVER (PARTITION BY user_id ORDER BY event_id) "
        "AS prev_type FROM events), "
        "m AS (SELECT prev_type AS p, event_type AS n, count(*) AS c "
        "FROM s WHERE prev_type IS NOT NULL GROUP BY 1, 2), "
        "tot AS (SELECT p, sum(c) AS t FROM m GROUP BY 1), "
        "pm AS MATERIALIZED (SELECT m.p, m.n, "
        "m.c / CAST(tot.t AS DOUBLE) AS pr FROM m JOIN tot USING (p)), "
        "st AS MATERIALIZED (SELECT p AS ty FROM pm "
        "UNION SELECT n FROM pm), "
        "kk AS (SELECT CAST(count(*) AS DOUBLE) AS k FROM st), "
        "v0 AS MATERIALIZED (SELECT ty, 1.0 / kk.k AS v FROM st, kk)"
    )
    for r in range(1, rounds + 1):
        sql += (
            f", v{r} AS MATERIALIZED (SELECT pm.n AS ty, "
            f"sum(v{r - 1}.v * pm.pr) AS v FROM v{r - 1} "
            f"JOIN pm ON pm.p = v{r - 1}.ty GROUP BY 1)"
        )
    sql += (
        f" SELECT ty AS event_type, round(v, 6) AS prob FROM v{rounds} "
        "ORDER BY ty"
    )
    return sql


def _lpa_chain_sql(rounds: int) -> str:
    """The SHARED unrolled-LPA CTE chain (edge cut -> und -> l0 ->
    c{r}/l{r} per round) used by BOTH the graph_label_prop oracle and
    the graph_modularity oracle — one builder so the two can never
    score different partitions. MATERIALIZED: plain CTE inlining
    re-evaluates the pair join exponentially."""
    sql = (
        "WITH li AS MATERIALIZED (SELECT DISTINCT l_orderkey AS g, "
        "l_partkey AS item FROM lineitem), "
        "p AS MATERIALIZED (SELECT x.item AS a, y.item AS b, "
        "CAST(count(*) AS BIGINT) AS cnt FROM li x "
        "JOIN li y ON x.g = y.g AND x.item < y.item GROUP BY 1, 2), "
        "e AS MATERIALIZED (SELECT a, b FROM p "
        "ORDER BY cnt DESC, a ASC, b ASC LIMIT 2000), "
        "und AS MATERIALIZED (SELECT a AS c, b AS n FROM e "
        "UNION ALL SELECT b, a FROM e), "
        "l0 AS MATERIALIZED (SELECT DISTINCT c AS node, c AS lab FROM und)"
    )
    for r in range(1, rounds + 1):
        prev = r - 1
        sql += (
            f", c{r} AS MATERIALIZED (SELECT u.c AS node, l.lab, "
            "CAST(count(*) AS BIGINT) AS cnt FROM und u "
            f"JOIN l{prev} l ON l.node = u.n GROUP BY 1, 2)"
            f", l{r} AS MATERIALIZED (SELECT node, lab FROM "
            "(SELECT node, lab, row_number() OVER (PARTITION BY node "
            f"ORDER BY cnt DESC, lab ASC) AS rn FROM c{r}) WHERE rn = 1)"
        )
    return sql


def _lpa_sql(rounds: int = 3) -> str:
    """Unrolled synchronous label propagation over the top-2000
    co-purchase edge cut — mode-of-neighbor-labels with (count desc,
    label asc) ties, the same rounds the engine runs."""
    return (_lpa_chain_sql(rounds)
            + f" SELECT node, lab AS label FROM l{rounds} ORDER BY node")


_BM25_SQL = (

            "WITH tok AS (SELECT doc_id, unnest(string_split_regex("
            "trim(text), '\\s+')) AS term FROM documents "
            "WHERE length(trim(text)) > 0), "
            "dl AS (SELECT doc_id, CAST(count(*) AS DOUBLE) AS dl "
            "FROM tok GROUP BY doc_id), "
            "st AS (SELECT count(*) AS n_docs, avg(dl) AS avgdl FROM dl), "
            "tf AS (SELECT doc_id, term, CAST(count(*) AS DOUBLE) AS tf "
            "FROM tok WHERE term IN ('join', 'stream', 'vector') "
            "GROUP BY doc_id, term), "
            "df AS (SELECT term, CAST(count(*) AS DOUBLE) AS df "
            "FROM tf GROUP BY term), "
            "sc AS (SELECT tf.doc_id, sum(ln((st.n_docs - df.df + 0.5) / "
            "(df.df + 0.5) + 1.0) * tf.tf * 2.2 / (tf.tf + 1.2 * "
            "(0.25 + 0.75 * dl.dl / st.avgdl))) AS score "
            "FROM tf JOIN df USING (term) JOIN dl USING (doc_id) "
            "CROSS JOIN st GROUP BY tf.doc_id) "
            # qualify sc.score in ORDER BY: a bare `score` would resolve
            # to the rounded alias, but the engine cuts top-k by the RAW
            # score — near-ties at the k boundary must break identically
            "SELECT doc_id, round(sc.score, 6) AS score FROM sc "
            "ORDER BY sc.score DESC, doc_id ASC LIMIT 20"
)


def _modularity_sql(rounds: int = 3) -> str:
    """Newman modularity of the unrolled-LPA communities — the SAME
    _lpa_chain_sql chain as graph_label_prop's oracle, finished with
    the single-division integer form sum(4*m*m_c - D_c^2) / (4*m^2)
    the engine computes."""
    return _lpa_chain_sql(rounds) + (
        f", ed AS (SELECT la.lab AS la, lb.lab AS lb FROM e "
        f"JOIN l{rounds} la ON la.node = e.a "
        f"JOIN l{rounds} lb ON lb.node = e.b), "
        "mm AS (SELECT CAST(count(*) AS HUGEINT) AS m FROM e), "
        "mc AS (SELECT la AS lab, CAST(count(*) AS HUGEINT) AS mc "
        "FROM ed WHERE la = lb GROUP BY 1), "
        "dc AS (SELECT lab, CAST(count(*) AS HUGEINT) AS dc FROM "
        "(SELECT la AS lab FROM ed UNION ALL SELECT lb FROM ed) "
        "GROUP BY 1), "
        "t AS (SELECT dc.lab, coalesce(mc.mc, 0) AS mc, dc.dc "
        "FROM dc LEFT JOIN mc ON mc.lab = dc.lab) "
        "SELECT CAST((SELECT m FROM mm) AS BIGINT) AS n_edges, "
        "CAST(count(*) AS BIGINT) AS n_communities, "
        "round(SUM(4 * (SELECT m FROM mm) * t.mc - t.dc * t.dc) "
        "/ (4.0 * (SELECT m FROM mm) * (SELECT m FROM mm)), 6) "
        "AS modularity FROM t"
    )


def _kcore_sql(k: int = 3, rounds: int = 4) -> str:
    """Unrolled bounded k-core peeling over the top-2000 co-purchase edge
    cut — the same `rounds` degree-fold/filter levels the engine runs
    (extra rounds past the fixed point are no-ops on both sides)."""
    # MATERIALIZED CTEs: DuckDB inlines plain CTEs per reference, so the
    # unrolled rounds would re-evaluate the expensive pair join
    # exponentially (observed: a spilled-to-disk blowup at sf0.1)
    sql = (
        "WITH li AS MATERIALIZED (SELECT DISTINCT l_orderkey AS g, "
        "l_partkey AS item FROM lineitem), "
        "p AS MATERIALIZED (SELECT x.item AS a, y.item AS b, "
        "CAST(count(*) AS BIGINT) AS cnt FROM li x "
        "JOIN li y ON x.g = y.g AND x.item < y.item GROUP BY 1, 2), "
        "e0 AS MATERIALIZED (SELECT a, b FROM p "
        "ORDER BY cnt DESC, a ASC, b ASC LIMIT 2000)"
    )
    for r in range(1, rounds + 1):
        prev = r - 1
        sql += (
            f", d{r} AS MATERIALIZED (SELECT node, "
            "CAST(count(*) AS BIGINT) AS d FROM "
            f"(SELECT a AS node FROM e{prev} "
            f"UNION ALL SELECT b FROM e{prev}) GROUP BY 1)"
            f", n{r} AS MATERIALIZED (SELECT node FROM d{r} "
            f"WHERE d >= {k})"
            f", e{r} AS MATERIALIZED (SELECT e{prev}.a, e{prev}.b "
            f"FROM e{prev} "
            f"JOIN n{r} x ON e{prev}.a = x.node "
            f"JOIN n{r} y ON e{prev}.b = y.node)"
        )
    fin = rounds + 1
    sql += (
        f", d{fin} AS MATERIALIZED (SELECT node, "
        "CAST(count(*) AS BIGINT) AS d FROM "
        f"(SELECT a AS node FROM e{rounds} "
        f"UNION ALL SELECT b FROM e{rounds}) GROUP BY 1) "
        f"SELECT n{rounds}.node, "
        f"CAST(coalesce(d{fin}.d, 0) AS BIGINT) AS core_deg "
        f"FROM n{rounds} LEFT JOIN d{fin} USING (node) ORDER BY node"
    )
    return sql

# synthesized messy URL per doc_id + the SAME canonicalization passes as
# functions/web.py (_CANON_STEPS order; RE2 both sides): global '&utm'
# removal first (kills every non-leading utm param in one scan), then the
# leading and solitary '?utm' forms.
_URL_CANON = (
    "WITH raw AS (SELECT doc_id, n_chars, "
    "CASE doc_id % 3 WHEN 0 THEN 'http://' WHEN 1 THEN 'https://' "
    "ELSE 'HTTPS://' END || "
    "CASE WHEN doc_id % 2 = 0 THEN 'www.' ELSE '' END || "
    "CASE WHEN doc_id % 5 = 0 THEN 'news.' ELSE '' END || "
    "'Host' || (doc_id % 23) || '.COM/p/' || doc_id || "
    "CASE doc_id % 4 WHEN 0 THEN '?utm_source=feed&q=1' "
    "WHEN 1 THEN '?q=1&utm_campaign=x' WHEN 2 THEN '#sec2' ELSE '/' END "
    "AS url FROM documents), "
    "s1 AS (SELECT doc_id, n_chars, regexp_replace(regexp_replace(url, "
    "'#.*$', '', 'g'), '^[A-Za-z][A-Za-z0-9+.-]*://', '', 'g') AS u FROM raw), "
    "s2 AS (SELECT doc_id, n_chars, "
    "regexp_replace(lower(regexp_extract(u, '^([^/?#]*)', 1)), "
    "'^www\\.', '', 'g') || substr(u, "
    "length(regexp_extract(u, '^([^/?#]*)', 1)) + 1) AS u FROM s1), "
    "s3 AS (SELECT doc_id, n_chars, regexp_replace(regexp_replace("
    "regexp_replace(regexp_replace(u, '&utm_[^&#]*', '', 'g'), "
    "'\\?utm_[^&#]*&', '?', 'g'), '\\?utm_[^&#]*$', '', 'g'), "
    "'/+$', '', 'g') AS url_canon FROM s2), "
    "canon AS (SELECT doc_id, n_chars, url_canon, "
    "coalesce(nullif(regexp_extract(regexp_extract(url_canon, "
    "'^([^/?#]*)', 1), '([^.]+\\.[^.]+)$', 1), ''), "
    "regexp_extract(url_canon, '^([^/?#]*)', 1)) AS domain FROM s3) "
)


_SHINGLES = (
    "WITH t AS (SELECT doc_id, string_split_regex(trim(lower(text)), '\\s+') AS tk "
    "FROM documents WHERE length(trim(text)) > 0), "
    "sh AS (SELECT doc_id, CASE WHEN len(tk) >= 3 THEN "
    "[tk[i] || ' ' || tk[i+1] || ' ' || tk[i+2] for i in generate_series(1, len(tk)-2)] "
    "ELSE [array_to_string(tk, ' ')] END AS gs FROM t), "
    "e AS (SELECT DISTINCT doc_id, unnest(gs) AS g FROM sh), "
    "sz AS (SELECT doc_id, count(*) AS n FROM e GROUP BY doc_id), "
    "i AS (SELECT x.doc_id AS a, y.doc_id AS b, count(*) AS c FROM e x "
    "JOIN e y ON x.g = y.g AND x.doc_id < y.doc_id GROUP BY 1, 2) "
)


def _sql_subst(sql: str, *pairs: tuple) -> str:
    """str.replace that REFUSES to no-op: oracle variants derived from a
    shared SQL template must fail loudly at definition time if the template
    text drifts, not desynchronize silently."""
    for old, new in pairs:
        if old not in sql:
            raise AssertionError(f"oracle template drift: {old!r} not found")
        sql = sql.replace(old, new)
    return sql


def _jaccard_sql(threshold: float) -> str:
    return (
        _SHINGLES
        + "SELECT a, b, round(CAST(c AS DOUBLE) / (sa.n + sb.n - c), 6) AS jaccard "
        "FROM i JOIN sz sa ON sa.doc_id = i.a JOIN sz sb ON sb.doc_id = i.b "
        f"WHERE CAST(c AS DOUBLE) / (sa.n + sb.n - c) >= {threshold}"
    )


def _simhash_sql() -> str:
    """Recompute 64-bit SimHash signatures in SQL (md5-derived token
    hashes) as two 32-bit halves, then all pairs with Hamming <= 3."""
    return (
        "WITH toks AS (SELECT doc_id, unnest(string_split_regex(trim(lower(text)), "
        "'\\s+')) AS tok FROM documents WHERE length(trim(text)) > 0), "
        "th AS (SELECT doc_id, ('0x' || substring(md5(tok), 1, 16))::UBIGINT AS h "
        "FROM toks), "
        "bits AS (SELECT doc_id, j, sum(CAST((h >> j) & 1 AS BIGINT)) AS ones, "
        "count(*) AS ntok FROM th, (SELECT unnest(generate_series(0, 63)) AS j) js "
        "GROUP BY doc_id, j), "
        "sig AS (SELECT doc_id, "
        "sum(CASE WHEN 2 * ones > ntok AND j < 32 THEN (CAST(1 AS BIGINT) << j) "
        "ELSE 0 END) AS lo, "
        "sum(CASE WHEN 2 * ones > ntok AND j >= 32 THEN (CAST(1 AS BIGINT) << (j - 32)) "
        "ELSE 0 END) AS hi FROM bits GROUP BY doc_id) "
        "SELECT x.doc_id AS a, y.doc_id AS b, "
        "CAST(bit_count(xor(CAST(x.lo AS UBIGINT), CAST(y.lo AS UBIGINT))) + "
        "bit_count(xor(CAST(x.hi AS UBIGINT), CAST(y.hi AS UBIGINT))) AS BIGINT) "
        "AS hamming "
        "FROM sig x JOIN sig y ON x.doc_id < y.doc_id "
        "WHERE bit_count(xor(CAST(x.lo AS UBIGINT), CAST(y.lo AS UBIGINT))) + "
        "bit_count(xor(CAST(x.hi AS UBIGINT), CAST(y.hi AS UBIGINT))) <= 3"
    )


def _lang_id_sql() -> str:
    """Stopword-count argmax with alphabetical tie-break + CJK shortcut —
    the IN-lists are generated from the same _STOPWORDS table the engine
    uses, so both sides share one vocabulary by construction."""
    from debezium_incubator_ray.functions.text import _STOPWORDS

    langs = ("de", "en", "es", "fr", "pt", "ru")
    sums = ", ".join(
        "sum(CASE WHEN tok IN ({}) THEN 1 ELSE 0 END) AS {}".format(
            ", ".join(f"'{w}'" for w in sorted(_STOPWORDS[lg])), lg
        )
        for lg in langs
    )
    g = "greatest(" + ", ".join(f"coalesce(h.{lg}, 0)" for lg in langs) + ")"
    case = " ".join(
        f"WHEN coalesce(h.{lg}, 0) = {g} THEN '{lg}'" for lg in langs
    )
    return (
        "WITH f AS (SELECT doc_id, unnest(string_split_regex(trim(lower(text)), "
        "'\\s+')) AS tok FROM documents WHERE length(trim(text)) > 0), "
        f"h AS (SELECT doc_id, {sums} FROM f GROUP BY doc_id) "
        "SELECT d.doc_id, CASE "
        "WHEN regexp_matches(d.text, '[\\x{4E00}-\\x{9FFF}]') THEN 'zh' "
        "WHEN regexp_matches(d.text, '[\\x{3040}-\\x{30FF}]') THEN 'ja' "
        f"WHEN {g} = 0 THEN 'und' {case} END AS pred_lang "
        "FROM documents d LEFT JOIN h ON h.doc_id = d.doc_id"
    )


def oracle_sql() -> dict[str, str]:
    lww_cols = "user_id, ts, event_type, value, props, lsn"
    out = {
        "cdc_fan_in": _LWW
        + "SELECT user_id, event_type, value FROM ranked "
        "WHERE rn = 1 AND op <> 'd'",
        "cdc_row_expiry": _LWW
        + f"SELECT {lww_cols} FROM ranked "
        "WHERE rn = 1 AND op <> 'd' "
        "AND (value >= 30.0 OR value IS NULL)",  # NULL never expires
        "cdc_materialized_view": _LWW
        + "SELECT event_type, CAST(count(*) AS BIGINT) AS n, "
        "round(sum(value), 3) AS total FROM ranked "
        "WHERE rn = 1 AND op <> 'd' GROUP BY event_type",
        "cdc_lww_state": _LWW
        + f"SELECT {lww_cols} FROM ranked WHERE rn = 1 AND op <> 'd'",
        "cdc_outbox": (
            # outbox routing: destination = event_type payload column;
            # deletes route by the before image (SQL lag); null route rows
            # reach no table
            "WITH env AS (SELECT user_id, event_id AS lsn, "
            "CASE WHEN event_id % 10 = 0 THEN 'd' "
            "WHEN event_id % 10 IN (1, 2) THEN 'c' ELSE 'u' END AS op, "
            "ts, event_type, value, props, "
            "CASE WHEN event_id % 10 = 0 THEN lag(event_type) OVER "
            "(PARTITION BY user_id ORDER BY event_id) "
            "ELSE event_type END AS rt FROM events), "
            "ranked AS (SELECT *, row_number() OVER "
            "(PARTITION BY rt, user_id ORDER BY lsn DESC) AS rn "
            "FROM env WHERE rt IS NOT NULL) "
            "SELECT 'out_' || rt AS tbl, user_id, ts, event_type, value, "
            "props, lsn FROM ranked WHERE rn = 1 AND op <> 'd'"
        ),
        "cdc_truncate": (
            # lsn = 2*event_id; the truncate marker at 2*T+1 wipes
            # everything at or below it, so exactly event_id > T survives
            "WITH t AS (SELECT (max(event_id) * 3) // 5 AS te "
            "FROM events), "
            "env AS (SELECT user_id, 2 * event_id AS lsn, "
            "CASE WHEN event_id % 10 = 0 THEN 'd' "
            "WHEN event_id % 10 IN (1, 2) THEN 'c' ELSE 'u' END AS op, "
            "ts, event_type, value, props FROM events, t "
            "WHERE event_id > t.te), "
            "ranked AS (SELECT *, row_number() OVER "
            "(PARTITION BY user_id ORDER BY lsn DESC) AS rn FROM env) "
            f"SELECT {lww_cols} FROM ranked WHERE rn = 1 AND op <> 'd'"
        ),
        "cdc_enriched_view": _LWW
        + (
            # stream-table join: the dimension is snapshot-static, so
            # enrichment-at-event-time equals enrichment of the final
            # state — LEFT join keeps facts with no dimension row
            "SELECT r.user_id, r.ts, r.event_type, r.value, r.props, "
            "c.c_name, c.c_acctbal, r.lsn FROM ranked r "
            "LEFT JOIN customer c ON r.user_id = c.c_custkey "
            "WHERE r.rn = 1 AND r.op <> 'd'"
        ),
        "cdc_segment_archive": _LWW
        + f"SELECT {lww_cols} FROM ranked WHERE rn = 1 AND op <> 'd'",
        "cdc_reshard": _LWW
        + f"SELECT {lww_cols} FROM ranked WHERE rn = 1 AND op <> 'd'",
        "cdc_lake_clone": _LWW
        + f"SELECT {lww_cols} FROM ranked WHERE rn = 1 AND op <> 'd'",
        "cdc_json_envelopes": _LWW
        + f"SELECT {lww_cols} FROM ranked WHERE rn = 1 AND op <> 'd'",
        "cdc_predicate_update": _LWW
        + "SELECT user_id, ts, event_type, "
        "CASE WHEN event_type = 'error' THEN value * 1.1 ELSE value END "
        "AS value, props, lsn "
        "FROM ranked WHERE rn = 1 AND op <> 'd'",
        "cdc_merge_into": _LWW
        + (
            # merge 1: upsert every user_id%3==0 up to max+100 (full-row
            # replace at lsn = COUNT(events), the first free LSN above all
            # watermarks); merge 2: delete matched user_id%7==0
            ", state AS ("
            f"SELECT {lww_cols} FROM ranked WHERE rn = 1 AND op <> 'd'), "
            "src AS (SELECT unnest(generate_series(0, "
            "(SELECT MAX(user_id) + 100 FROM events), 3)) AS user_id) "
            "SELECT COALESCE(t.user_id, s.user_id) AS user_id, "
            "CASE WHEN s.user_id IS NULL THEN t.ts END AS ts, "
            "CASE WHEN s.user_id IS NULL THEN t.event_type "
            "ELSE 'merged' END AS event_type, "
            "CASE WHEN s.user_id IS NULL THEN t.value "
            "ELSE s.user_id * 0.5 END AS value, "
            "CASE WHEN s.user_id IS NULL THEN t.props END AS props, "
            "CASE WHEN s.user_id IS NULL THEN t.lsn "
            "ELSE (SELECT COUNT(*) FROM events) END AS lsn "
            "FROM state t FULL OUTER JOIN src s ON t.user_id = s.user_id "
            "WHERE COALESCE(t.user_id, s.user_id) % 7 <> 0"
        ),
        "cdc_error_quarantine": (
            # p=3/seg-00000 (the first 4096 events of partition
            # user_id % 8 = 3, segments are LSN-ordered) is corrupted and
            # quarantined; LWW over everything else
            "WITH excl AS (SELECT event_id FROM events "
            "WHERE user_id % 8 = 3 ORDER BY event_id LIMIT 4096), "
            "env AS (SELECT user_id, event_id AS lsn, "
            "CASE WHEN event_id % 10 = 0 THEN 'd' "
            "WHEN event_id % 10 IN (1, 2) THEN 'c' ELSE 'u' END AS op, "
            "ts, event_type, value, props FROM events "
            "WHERE event_id NOT IN (SELECT event_id FROM excl)), "
            "ranked AS (SELECT *, row_number() OVER "
            "(PARTITION BY user_id ORDER BY lsn DESC) AS rn FROM env) "
            f"SELECT {lww_cols} FROM ranked WHERE rn = 1 AND op <> 'd'"
        ),
        "cdc_partial_updates": (
            # per-cell LWW: cell j's final value = the latest LIVE event
            # that SET it (mask bit j; live = after the key's last row
            # deletion). arg_max takes a struct so a stored NULL survives
            # (bare arg_max skips NULL arguments).
            f"WITH env AS ({_ENV}), m AS (SELECT env.*, "
            "CASE WHEN lsn % 10 IN (0, 1, 2) THEN 31 "
            "ELSE (lsn & 30) | 1 END AS mask FROM env), "
            "dl AS (SELECT user_id, COALESCE(MAX(lsn) FILTER (op = 'd'), -1) "
            "AS ld FROM m GROUP BY 1), "
            "live AS (SELECT m.* FROM m JOIN dl USING (user_id) "
            "WHERE m.op <> 'd' AND m.lsn > dl.ld) "
            "SELECT user_id, "
            "arg_max({'v': ts}, lsn) FILTER (((mask >> 1) & 1) = 1)['v'] AS ts, "
            "arg_max({'v': event_type}, lsn) FILTER (((mask >> 2) & 1) = 1)['v'] "
            "AS event_type, "
            "arg_max({'v': value}, lsn) FILTER (((mask >> 3) & 1) = 1)['v'] "
            "AS value, "
            "arg_max({'v': props}, lsn) FILTER (((mask >> 4) & 1) = 1)['v'] "
            "AS props, "
            "MAX(lsn) AS lsn FROM live GROUP BY user_id"
        ),
        "cdc_partial_blacklist": (
            # the partial-updates oracle minus the blacklisted props column;
            # the mask bits tested are the WRITER's (1=ts, 2=event_type,
            # 3=value) — the engine re-indexes them over the shaped schema
            f"WITH env AS ({_ENV}), m AS (SELECT env.*, "
            "CASE WHEN lsn % 10 IN (0, 1, 2) THEN 31 "
            "ELSE (lsn & 30) | 1 END AS mask FROM env), "
            "dl AS (SELECT user_id, COALESCE(MAX(lsn) FILTER (op = 'd'), -1) "
            "AS ld FROM m GROUP BY 1), "
            "live AS (SELECT m.* FROM m JOIN dl USING (user_id) "
            "WHERE m.op <> 'd' AND m.lsn > dl.ld) "
            "SELECT user_id, "
            "arg_max({'v': ts}, lsn) FILTER (((mask >> 1) & 1) = 1)['v'] AS ts, "
            "arg_max({'v': event_type}, lsn) FILTER (((mask >> 2) & 1) = 1)['v'] "
            "AS event_type, "
            "arg_max({'v': value}, lsn) FILTER (((mask >> 3) & 1) = 1)['v'] "
            "AS value, "
            "MAX(lsn) AS lsn FROM live GROUP BY user_id"
        ),
        "cdc_partial_evolution": (
            # the partial-updates oracle + the evolved score column:
            # a v2 event (lsn > mid) sets score=value*2 when created ('c')
            # or when mask bit 5 fires on an update; a key whose row
            # survives on v1 events alone carries the backfilled default
            # 1.5; a key re-created after a deletion with no score setter
            # is NULL. mid = max(event_id)//2, the epoch/DDL boundary.
            f"WITH env AS ({_ENV}), "
            "mid AS (SELECT MAX(event_id) // 2 AS m FROM events), "
            "m AS (SELECT env.*, "
            "CASE WHEN lsn % 10 IN (0, 1, 2) THEN 31 "
            "ELSE (lsn & 30) | 1 END AS mask, "
            "(lsn > (SELECT m FROM mid) AND (op = 'c' OR ((lsn >> 5) & 1) = 1)) "
            "AS score_set FROM env), "
            "dl AS (SELECT user_id, COALESCE(MAX(lsn) FILTER (op = 'd'), -1) "
            "AS ld FROM m GROUP BY 1), "
            "live AS (SELECT m.* FROM m JOIN dl USING (user_id) "
            "WHERE m.op <> 'd' AND m.lsn > dl.ld) "
            "SELECT user_id, "
            "arg_max({'v': ts}, lsn) FILTER (((mask >> 1) & 1) = 1)['v'] AS ts, "
            "arg_max({'v': event_type}, lsn) FILTER (((mask >> 2) & 1) = 1)['v'] "
            "AS event_type, "
            "arg_max({'v': value}, lsn) FILTER (((mask >> 3) & 1) = 1)['v'] "
            "AS value, "
            "arg_max({'v': props}, lsn) FILTER (((mask >> 4) & 1) = 1)['v'] "
            "AS props, "
            "COALESCE(arg_max({'v': value * 2}, lsn) FILTER (score_set)['v'], "
            "CASE WHEN COUNT(*) FILTER (lsn <= (SELECT m FROM mid)) > 0 "
            "THEN 1.5 END) AS score, "
            "MAX(lsn) AS lsn FROM live GROUP BY user_id"
        ),
        "cdc_range_erase": _LWW
        + f"SELECT {lww_cols} FROM ranked WHERE rn = 1 AND op <> 'd' "
        "AND user_id NOT BETWEEN 10 AND 59",
        "cdc_compaction": _LWW
        + f"SELECT {lww_cols} FROM ranked WHERE rn = 1 AND op <> 'd'",
        "cdc_mor_lww": _LWW
        + f"SELECT {lww_cols} FROM ranked WHERE rn = 1 AND op <> 'd'",
        "cdc_time_travel": f"WITH env AS ({_ENV}), "
        "f AS (SELECT * FROM env WHERE lsn <= (SELECT max(event_id) FROM events) // 2), "
        "ranked AS (SELECT *, row_number() OVER "
        "(PARTITION BY user_id ORDER BY lsn DESC) AS rn FROM f) "
        f"SELECT {lww_cols} FROM ranked WHERE rn = 1 AND op <> 'd'",
        "cdc_replay_dup": _LWW
        + f"SELECT {lww_cols} FROM ranked WHERE rn = 1 AND op <> 'd'",
        "cdc_restart_resume": _LWW
        + f"SELECT {lww_cols} FROM ranked WHERE rn = 1 AND op <> 'd'",
        "cdc_snapshot_handoff": _LWW
        + "SELECT user_id, ts, event_type, value, props "
        "FROM ranked WHERE rn = 1 AND op <> 'd'",
        "cdc_snapshot_filter": (
            # even users: LWW over their full stream (the snapshot is
            # superseded); odd users: snapshot-only — LWW over events <=
            # handoff, kept only when the override predicate passes
            f"WITH env AS ({_ENV}), "
            "h AS (SELECT MAX(event_id) // 2 AS v FROM events), "
            "ranked_all AS (SELECT *, row_number() OVER "
            "(PARTITION BY user_id ORDER BY lsn DESC) AS rn FROM env "
            "WHERE user_id % 2 = 0), "
            "ranked_pre AS (SELECT *, row_number() OVER "
            "(PARTITION BY user_id ORDER BY lsn DESC) AS rn FROM env "
            "WHERE user_id % 2 = 1 AND lsn <= (SELECT v FROM h)) "
            "SELECT user_id, ts, event_type, value, props FROM ranked_all "
            "WHERE rn = 1 AND op <> 'd' "
            "UNION ALL "
            "SELECT user_id, ts, event_type, value, props FROM ranked_pre "
            "WHERE rn = 1 AND op <> 'd' AND value >= 30.0"
        ),
        "cdc_incremental_snapshot": _LWW
        + "SELECT user_id, ts, event_type, value, props "
        "FROM ranked WHERE rn = 1 AND op <> 'd'",
        "cdc_point_lookup": _LWW
        + f"SELECT {lww_cols} FROM ranked WHERE rn = 1 AND op <> 'd' "
        "AND user_id < 30",
        "cdc_changelog_diff": (
            f"WITH env AS ({_ENV}), "
            "cut AS (SELECT max(event_id) // 2 AS c FROM events), "
            "w1 AS (SELECT * FROM (SELECT *, row_number() OVER "
            "(PARTITION BY user_id ORDER BY lsn DESC) AS rn FROM env "
            "WHERE lsn <= (SELECT c FROM cut)) WHERE rn = 1 AND op <> 'd'), "
            "w2 AS (SELECT * FROM (SELECT *, row_number() OVER "
            "(PARTITION BY user_id ORDER BY lsn DESC) AS rn FROM env) "
            "WHERE rn = 1 AND op <> 'd') "
            "SELECT coalesce(w2.user_id, w1.user_id) AS user_id, "
            "w2.ts AS ts, w2.event_type AS event_type, w2.value AS value, "
            "w2.props AS props, coalesce(w2.lsn, w1.lsn) AS lsn, "
            "CASE WHEN w1.user_id IS NULL THEN 'c' "
            "WHEN w2.user_id IS NULL THEN 'd' ELSE 'u' END AS op "
            "FROM w1 FULL OUTER JOIN w2 ON w1.user_id = w2.user_id "
            "WHERE w1.user_id IS NULL OR w2.user_id IS NULL "
            "OR w1.lsn <> w2.lsn"
        ),
        "cdc_field_blacklist": _LWW
        + "SELECT user_id, ts, event_type, value, lsn "
        "FROM ranked WHERE rn = 1 AND op <> 'd'",
        "cdc_column_mask": _LWW
        + (
            # redaction is row-wise deterministic, so transform-then-LWW
            # (the engine) equals LWW-then-transform (this oracle)
            "SELECT user_id, ts, md5(event_type) AS event_type, value, "
            "CASE WHEN props IS NULL THEN NULL ELSE '******' END AS props, "
            "lsn FROM ranked WHERE rn = 1 AND op <> 'd'"
        ),
        "cdc_column_truncate": _LWW
        + "SELECT user_id, ts, event_type, value, "
        "left(props, 8) AS props, lsn "
        "FROM ranked WHERE rn = 1 AND op <> 'd'",
        "cdc_flatten_rewrite": (
            # the envelope's before image is lag(payload) per user; a
            # delete's flattened payload = that before (all-NULL when no
            # prior event exists — the null struct)
            "WITH env AS (SELECT user_id, event_id AS lsn, "
            "CASE WHEN event_id % 10 = 0 THEN 'd' "
            "WHEN event_id % 10 IN (1, 2) THEN 'c' ELSE 'u' END AS op, "
            "ts, event_type, value, props, "
            "lag(ts) OVER w AS b_ts, "
            "lag(event_type) OVER w AS b_event_type, "
            "lag(value) OVER w AS b_value, "
            "lag(props) OVER w AS b_props, "
            "lag(event_id) OVER w AS b_prev "
            "FROM events WINDOW w AS "
            "(PARTITION BY user_id ORDER BY event_id)) "
            "SELECT CASE WHEN op = 'd' AND b_prev IS NULL THEN NULL "
            "ELSE user_id END AS user_id, "
            "CASE WHEN op = 'd' THEN b_ts ELSE ts END AS ts, "
            "CASE WHEN op = 'd' THEN b_event_type ELSE event_type END "
            "AS event_type, "
            "CASE WHEN op = 'd' THEN b_value ELSE value END AS value, "
            "CASE WHEN op = 'd' THEN b_props ELSE props END AS props, "
            "op AS __op, lsn AS __lsn, "
            "CASE WHEN op = 'd' THEN 'true' ELSE 'false' END AS __deleted "
            "FROM env"
        ),
        "cdc_flatten_drop": (
            f"WITH env AS ({_ENV}) "
            "SELECT user_id, ts, event_type, value, props, "
            "op AS __op, lsn AS __lsn FROM env WHERE op <> 'd'"
        ),
        "cdc_table_filter": _LWW
        + f"SELECT {lww_cols} FROM ranked "
        "WHERE rn = 1 AND op <> 'd' AND user_id % 2 = 0",
        "cdc_tombstones": _LWW
        + "SELECT user_id, lsn FROM ranked WHERE rn = 1 AND op = 'd'",
        "cdc_watermarks": (
            "SELECT CAST(user_id % 8 AS INTEGER) AS partition, "
            "max(event_id) AS watermark FROM events GROUP BY 1"
        ),
        "cdc_changelog_counts": (
            f"WITH env AS ({_ENV}) SELECT op, count(*) AS n FROM env GROUP BY op"
        ),
        "cdc_before_images": (
            "WITH env AS (SELECT user_id, event_id AS lsn, "
            "CASE WHEN event_id % 10 = 0 THEN 'd' "
            "WHEN event_id % 10 IN (1, 2) THEN 'c' ELSE 'u' END AS op, value, "
            "lag(value) OVER (PARTITION BY user_id ORDER BY event_id) AS before_value "
            "FROM events) "
            "SELECT user_id, lsn, before_value, value FROM env WHERE op = 'u'"
        ),
        "cdc_partition_skew": (
            # NUM_PARTITIONS = 8; the mod partitioner is user_id % 8.
            # A delete at a user's FIRST event has no before image, so it
            # carries no key and normalize drops it — mirrored here
            "WITH env AS (SELECT user_id, "
            "CASE WHEN event_id % 10 = 0 THEN 'd' "
            "WHEN event_id % 10 IN (1, 2) THEN 'c' ELSE 'u' END AS op, "
            "lag(event_id) OVER (PARTITION BY user_id ORDER BY event_id) "
            "AS prev FROM events), "
            "c AS (SELECT user_id % 8 AS partition, "
            "CAST(count(*) AS BIGINT) AS n FROM env "
            "WHERE NOT (op = 'd' AND prev IS NULL) GROUP BY 1), "
            "t AS (SELECT sum(n) AS total FROM c) "
            "SELECT partition, n, "
            "round(n * 1.0 / (SELECT total FROM t), 6) AS share, "
            "round(n * 1.0 / ((SELECT total FROM t) / 8.0), 6) AS skew "
            "FROM c"
        ),
        "cdc_changed_columns": (
            # the before image is the user's previous payload (same lag
            # model as cdc_before_images); changed = IS DISTINCT FROM
            "WITH env AS (SELECT "
            "CASE WHEN event_id % 10 = 0 THEN 'd' "
            "WHEN event_id % 10 IN (1, 2) THEN 'c' ELSE 'u' END AS op, "
            "ts, event_type, value, props, "
            "lag(ts) OVER w AS b_ts, lag(event_type) OVER w AS b_et, "
            "lag(value) OVER w AS b_v, lag(props) OVER w AS b_p "
            "FROM events WINDOW w AS "
            "(PARTITION BY user_id ORDER BY event_id)), "
            "u AS (SELECT * FROM env WHERE op = 'u') "
            "SELECT 'ts' AS col, CAST(count(*) AS BIGINT) AS n_updates, "
            "CAST(sum(CASE WHEN ts IS DISTINCT FROM b_ts THEN 1 ELSE 0 "
            "END) AS BIGINT) AS n_changed, "
            "round(sum(CASE WHEN ts IS DISTINCT FROM b_ts THEN 1 ELSE 0 "
            "END) * 1.0 / count(*), 6) AS change_rate FROM u "
            "UNION ALL "
            "SELECT 'event_type', CAST(count(*) AS BIGINT), "
            "CAST(sum(CASE WHEN event_type IS DISTINCT FROM b_et THEN 1 "
            "ELSE 0 END) AS BIGINT), "
            "round(sum(CASE WHEN event_type IS DISTINCT FROM b_et THEN 1 "
            "ELSE 0 END) * 1.0 / count(*), 6) FROM u "
            "UNION ALL "
            "SELECT 'value', CAST(count(*) AS BIGINT), "
            "CAST(sum(CASE WHEN value IS DISTINCT FROM b_v THEN 1 ELSE 0 "
            "END) AS BIGINT), "
            "round(sum(CASE WHEN value IS DISTINCT FROM b_v THEN 1 ELSE 0 "
            "END) * 1.0 / count(*), 6) FROM u "
            "UNION ALL "
            "SELECT 'props', CAST(count(*) AS BIGINT), "
            "CAST(sum(CASE WHEN props IS DISTINCT FROM b_p THEN 1 ELSE 0 "
            "END) AS BIGINT), "
            "round(sum(CASE WHEN props IS DISTINCT FROM b_p THEN 1 ELSE 0 "
            "END) * 1.0 / count(*), 6) FROM u"
        ),
        "cdc_snapshot_read": (
            "SELECT doc_id, text, lang, source, n_chars, "
            "'r' AS op, true AS snapshot FROM documents"
        ),
        "cdc_schema_evolution": _LWW
        + "SELECT user_id, ts, event_type, value, props, "
        "CASE WHEN lsn > (SELECT max(event_id) FROM events) // 2 "
        "THEN value * 2 ELSE -1.0 END AS score, lsn "
        "FROM ranked WHERE rn = 1 AND op <> 'd'",
        "cdc_schema_evolution_ddl": _LWW
        + "SELECT user_id, ts, event_type, value, props, "
        "CASE WHEN lsn > (SELECT max(event_id) FROM events) // 2 "
        "THEN value * 2 ELSE -1.0 END AS score, lsn "
        "FROM ranked WHERE rn = 1 AND op <> 'd'",
        "cdc_schema_create_ddl": _LWW
        + "SELECT user_id, ts, event_type, value, props, lsn, "
        "CAST(1 AS BIGINT) AS n_tables "
        "FROM ranked WHERE rn = 1 AND op <> 'd'",
        "cdc_schema_widen": _LWW
        + "SELECT user_id, ts, event_type, "
        "CAST(CAST(value AS REAL) AS DOUBLE) AS value, props, lsn "
        "FROM ranked WHERE rn = 1 AND op <> 'd'",
        "cdc_schema_drop": _LWW
        + "SELECT user_id, ts, event_type, value, lsn "
        "FROM ranked WHERE rn = 1 AND op <> 'd'",
        "cdc_schema_rename": _LWW
        + "SELECT user_id, ts, event_type, value, props AS attrs, lsn "
        "FROM ranked WHERE rn = 1 AND op <> 'd'",
        "cdc_multi_table": _LWW
        + f"SELECT {lww_cols}, "
        "CASE WHEN user_id % 2 = 0 THEN 'events_a' ELSE 'events_b' END AS tbl "
        "FROM ranked WHERE rn = 1 AND op <> 'd'",
        "cdc_latest_only": (
            # last 4096-row segment per binlog partition (user_id % 8),
            # segments cut by per-partition event order — then LWW inside it
            "WITH env AS (SELECT user_id, event_id AS lsn, "
            "CASE WHEN event_id % 10 = 0 THEN 'd' "
            "WHEN event_id % 10 IN (1, 2) THEN 'c' ELSE 'u' END AS op, "
            "ts, event_type, value, props, "
            "row_number() OVER (PARTITION BY user_id % 8 ORDER BY event_id) AS rn_p, "
            "count(*) OVER (PARTITION BY user_id % 8) AS cnt_p FROM events), "
            "latest AS (SELECT * FROM env "
            "WHERE (rn_p - 1) // 4096 = (cnt_p - 1) // 4096), "
            "ranked AS (SELECT *, row_number() OVER "
            "(PARTITION BY user_id ORDER BY lsn DESC) AS rn FROM latest) "
            "SELECT user_id, ts, event_type, value, props, lsn "
            "FROM ranked WHERE rn = 1 AND op <> 'd'"
        ),
        "cdc_tombstone_retain": _LWW
        + "SELECT user_id, "
        "CASE WHEN op = 'd' THEN NULL ELSE ts END AS ts, "
        "CASE WHEN op = 'd' THEN NULL ELSE event_type END AS event_type, "
        "CASE WHEN op = 'd' THEN NULL ELSE value END AS value, "
        "CASE WHEN op = 'd' THEN NULL ELSE props END AS props, "
        "(op = 'd') AS deleted, lsn FROM ranked WHERE rn = 1",
        "cdc_tombstone_purge": _LWW
        + "SELECT user_id, "
        "CASE WHEN op = 'd' THEN NULL ELSE ts END AS ts, "
        "CASE WHEN op = 'd' THEN NULL ELSE event_type END AS event_type, "
        "CASE WHEN op = 'd' THEN NULL ELSE value END AS value, "
        "CASE WHEN op = 'd' THEN NULL ELSE props END AS props, "
        "(op = 'd') AS deleted, lsn FROM ranked WHERE rn = 1 "
        "AND NOT (op = 'd' AND lsn <= (SELECT MAX(event_id) // 2 FROM events))",
        "type_normalization": (
            "SELECT l_orderkey, l_linenumber, "
            "CAST(floor(l_quantity) AS BIGINT) AS qty_int, "
            "CAST(floor(l_quantity) AS SMALLINT) AS qty_i16, "
            "CAST(l_tax AS REAL) AS tax_f32, "
            "epoch_ms(l_shipdate) AS ship_ms, "
            "strftime(l_shipdate, '%Y-%m-%d %H:%M:%S') AS ship_iso "
            "FROM lineitem"
        ),
        "type_normalization_ltz": (
            # the reference's LTZ rule IS the oracle: unsupported type ->
            # typed NULL per row, field kept in the schema
            "SELECT event_id, CAST(NULL AS VARCHAR) AS ts_ltz, "
            "epoch_us(ts) AS ts_us FROM events"
        ),
        "type_normalization_nested": (
            "WITH base AS (SELECT doc_id, text, lang, n_chars, "
            "CASE WHEN length(trim(text)) = 0 THEN [] "
            "ELSE string_split_regex(trim(lower(text)), '\\s+') END AS tk "
            "FROM documents) "
            "SELECT doc_id, "
            "CAST(len(list_distinct(tk)) AS BIGINT) AS n_distinct_toks, "
            "list_sort(list_distinct(tk))[1] AS first_tok, "
            "CAST(doc_id AS VARCHAR) AS map_key0, lang AS map_val0, "
            "lpad(CAST(doc_id AS VARCHAR), 8, '0') || '000040008000' || "
            "lpad(CAST(n_chars AS VARCHAR), 12, '0') AS uuid_hex, "
            "CAST(doc_id % 24 AS INTEGER) AS dur_months, "
            "CAST(doc_id % 31 AS INTEGER) AS dur_days, "
            "CAST(n_chars * 1000 AS BIGINT) AS dur_nanos, "
            "(CAST(doc_id % 5 AS DOUBLE) * 86400 + 12 * 3600 + 34 * 60 + "
            "doc_id % 60) * 1000000.0 AS ivl_micros, "
            "CAST((doc_id % 9) * 12 + doc_id % 12 AS INTEGER) AS ym_months, "
            "CAST(CAST(n_chars / 8.0 AS DECIMAL(12,6)) AS VARCHAR) AS dec_str, "
            "CAST(6 AS INTEGER) AS vsd_scale, "
            "CAST(n_chars * 125000 AS BIGINT) AS vsd_value "
            "FROM base"
        ),
        "row_scoped_max": (
            "SELECT l_orderkey, l_linenumber, "
            "greatest(l_tax, l_discount) AS writetime_max FROM lineitem"
        ),
        "agg_presum_groupby": (
            "SELECT event_type, round(sum(value), 3) AS total_value, "
            "count(*) AS n FROM events GROUP BY event_type"
        ),
        "quantiles_by_type": (
            "WITH a AS (SELECT event_type, "
            "quantile_cont(value, [0.5, 0.9, 0.99]) AS vs "
            "FROM events GROUP BY event_type), "
            "b AS (SELECT event_type, unnest([0.5, 0.9, 0.99]) AS q, "
            "unnest(vs) AS v FROM a) "
            "SELECT event_type, q, round(v, 6) AS value FROM b"
        ),
        "asof_join_events": (
            "WITH l AS (SELECT user_id, ts, event_id, value FROM events "
            "WHERE event_id % 2 = 0), "
            "r AS (SELECT user_id, ts, event_id AS r_event_id, "
            "value AS r_value FROM events WHERE event_id % 2 = 1) "
            "SELECT l.user_id, l.ts, l.event_id, l.value, "
            "r.r_event_id, r.r_value FROM l ASOF LEFT JOIN r "
            "ON l.user_id = r.user_id AND l.ts >= r.ts"
        ),
        "events_in_sessions": (
            "WITH o AS (SELECT user_id, ts, event_id, value, "
            "CASE WHEN epoch_us(ts) - epoch_us(lag(ts) OVER "
            "(PARTITION BY user_id ORDER BY ts)) > 1800000000 "
            "OR lag(ts) OVER (PARTITION BY user_id ORDER BY ts) IS NULL "
            "THEN 1 ELSE 0 END AS new_s FROM events), "
            "g AS (SELECT *, sum(new_s) OVER (PARTITION BY user_id "
            "ORDER BY ts ROWS UNBOUNDED PRECEDING) AS sid FROM o), "
            "s AS (SELECT user_id, sid, min(ts) AS session_start, "
            "max(ts) AS session_end, count(*) AS n_events "
            "FROM g GROUP BY user_id, sid) "
            "SELECT g.event_id, g.user_id, g.ts, g.value, "
            "s.session_start, s.session_end, s.n_events "
            "FROM g JOIN s ON g.user_id = s.user_id AND g.sid = s.sid"
        ),
        "events_rolling_distinct": (
            "WITH ev AS (SELECT date_trunc('day', ts) AS day, user_id "
            "FROM events), days AS (SELECT DISTINCT day FROM ev) "
            "SELECT d.day AS day, "
            "CAST(count(DISTINCT e.user_id) AS BIGINT) AS n_ids "
            "FROM days d JOIN ev e "
            "ON e.day BETWEEN d.day - INTERVAL 6 DAY AND d.day "
            "GROUP BY d.day"
        ),
        "events_stickiness": (
            "WITH ev AS (SELECT date_trunc('day', ts) AS day, user_id "
            "FROM events), days AS (SELECT DISTINCT day FROM ev), "
            "wau AS (SELECT d.day, "
            "CAST(count(DISTINCT e.user_id) AS BIGINT) AS wau "
            "FROM days d JOIN ev e "
            "ON e.day BETWEEN d.day - INTERVAL 6 DAY AND d.day "
            "GROUP BY d.day), "
            "dau AS (SELECT day, "
            "CAST(count(DISTINCT user_id) AS BIGINT) AS dau "
            "FROM ev GROUP BY day) "
            "SELECT wau.day AS day, dau.dau, wau.wau, "
            "round(CAST(dau.dau AS DOUBLE) / wau.wau, 6) AS stickiness "
            "FROM wau JOIN dau ON wau.day = dau.day"
        ),
        "stats_spearman": (
            # tie-average ranks: rank() (min rank) + (tie count - 1)/2
            "WITH r AS (SELECT "
            "rank() OVER (ORDER BY l_quantity) "
            "+ (count(*) OVER (PARTITION BY l_quantity) - 1) / 2.0 AS ra, "
            "rank() OVER (ORDER BY l_discount) "
            "+ (count(*) OVER (PARTITION BY l_discount) - 1) / 2.0 AS rb "
            "FROM lineitem "
            "WHERE l_quantity IS NOT NULL AND l_discount IS NOT NULL) "
            "SELECT round(corr(ra, rb), 6) AS spearman, "
            "CAST(count(*) AS BIGINT) AS n FROM r"
        ),
        "events_gini": (
            # exact integer rank-sum Gini; row_number tie order is
            # irrelevant because tied c contribute the same i*c total
            "WITH uc AS (SELECT user_id, CAST(COUNT(*) AS BIGINT) AS c "
            "FROM events GROUP BY user_id), "
            "r AS (SELECT c, row_number() OVER (ORDER BY c) AS i FROM uc) "
            "SELECT round(2.0 * SUM(i * c) / (COUNT(*) * SUM(c)) "
            "- (COUNT(*) + 1.0) / COUNT(*), 6) AS gini, "
            "CAST(COUNT(*) AS BIGINT) AS n_keys FROM r"
        ),
        "orders_value_gini": (
            # cent grid; HUGEINT rank-weighted sum, one cast at the end
            "WITH v AS (SELECT CAST(round(o_totalprice * 100) AS BIGINT) "
            "AS c FROM orders WHERE o_totalprice IS NOT NULL), "
            "r AS (SELECT c, row_number() OVER (ORDER BY c) AS i FROM v) "
            "SELECT round(2.0 * SUM(CAST(i AS HUGEINT) * c) "
            "/ (COUNT(*) * SUM(CAST(c AS HUGEINT))) "
            "- (COUNT(*) + 1.0) / COUNT(*), 6) AS gini, "
            "CAST(COUNT(*) AS BIGINT) AS n FROM r"
        ),
        "lineitem_q6_revenue": (
            # exact cents x basis-points, one cast at the end
            "SELECT round(SUM(CAST(round(l_extendedprice * 100) AS "
            "HUGEINT) * CAST(round(l_discount * 100) AS BIGINT)) "
            "/ 10000.0, 2) AS revenue, CAST(COUNT(*) AS BIGINT) AS n "
            "FROM lineitem WHERE l_discount BETWEEN 0.05 AND 0.07 "
            "AND l_quantity < 24"
        ),
        "lineitem_q1_pricing": (
            # ALL money math in exact cents x basis-points HUGEINTs;
            # every 2dp/6dp output is rounded half-AWAY in INTEGER
            # space ((v + half) // unit), mirroring the engine exactly —
            # these sums land on rational grids where float round()
            # would tie-break half-even
            "WITH f AS (SELECT l_returnflag, l_linestatus, "
            "CAST(round(l_quantity * 100) AS HUGEINT) AS qc, "
            "CAST(round(l_extendedprice * 100) AS HUGEINT) AS pc, "
            "CAST(round(l_discount * 100) AS HUGEINT) AS db, "
            "CAST(round(l_tax * 100) AS HUGEINT) AS tb FROM lineitem "
            "WHERE l_shipdate <= TIMESTAMP '2000-09-02 00:00:00'), "
            "g AS (SELECT l_returnflag, l_linestatus, "
            "SUM(qc) AS sq, SUM(pc) AS sp, "
            "SUM(pc * (100 - db)) AS sdp, "
            "SUM(pc * (100 - db) * (100 + tb)) AS sch, "
            "SUM(db) AS sd, CAST(COUNT(*) AS HUGEINT) AS n FROM f "
            "GROUP BY 1, 2) "
            "SELECT l_returnflag, l_linestatus, "
            "sq / 100.0 AS sum_qty, sp / 100.0 AS sum_base_price, "
            "((sdp + 50) // 100) / 100.0 AS sum_disc_price, "
            "((sch + 5000) // 10000) / 100.0 AS sum_charge, "
            "((20000 * sq + n) // (2 * n)) / 1000000.0 AS avg_qty, "
            "((20000 * sp + n) // (2 * n)) / 1000000.0 AS avg_price, "
            "((20000 * sd + n) // (2 * n)) / 1000000.0 AS avg_disc, "
            "CAST(n AS BIGINT) AS count_order "
            "FROM g ORDER BY 1, 2"
        ),
        "join_q3_shipping": (
            # revenue rounded half-away to 2dp in INT cents BEFORE the
            # top-10 (the engine orders by the rounded value); ties on
            # the rounded revenue break by orderkey
            "WITH r AS (SELECT l.l_orderkey, "
            "SUM(CAST(round(l.l_extendedprice * 100) AS HUGEINT) * "
            "(100 - CAST(round(l.l_discount * 100) AS BIGINT))) AS rev "
            "FROM lineitem l JOIN orders o ON o.o_orderkey = l.l_orderkey "
            "JOIN customer c ON c.c_custkey = o.o_custkey "
            "WHERE c.c_mktsegment = 'BUILDING' "
            "AND o.o_orderdate < TIMESTAMP '2000-03-15 00:00:00' "
            "AND l.l_shipdate > TIMESTAMP '2000-03-15 00:00:00' "
            "GROUP BY 1) "
            "SELECT r.l_orderkey AS o_orderkey, "
            "((r.rev + 50) // 100) / 100.0 AS revenue, "
            "CAST(CAST(o.o_orderdate AS DATE) AS VARCHAR) AS order_day, "
            "o.o_orderpriority FROM r "
            "JOIN orders o ON o.o_orderkey = r.l_orderkey "
            "ORDER BY ((r.rev + 50) // 100) DESC, r.l_orderkey ASC "
            "LIMIT 10"
        ),
        "stats_cramers_v": (
            # full r x c grid INCLUDING zero-observed cells (they still
            # contribute E); chi2/V are irrational so round(6) on the
            # shared double algebra is drift-safe
            "WITH c AS (SELECT lang AS a, source AS b, "
            "CAST(count(*) AS BIGINT) AS n FROM documents "
            "WHERE lang IS NOT NULL AND source IS NOT NULL "
            "GROUP BY 1, 2), "
            "rt AS (SELECT a, sum(n) AS rn FROM c GROUP BY a), "
            "ct AS (SELECT b, sum(n) AS cn FROM c GROUP BY b), "
            "tot AS (SELECT sum(n) AS nn FROM c), "
            "grid AS (SELECT rt.a, ct.b, rt.rn, ct.cn, "
            "coalesce(c.n, 0) AS n FROM rt CROSS JOIN ct "
            "LEFT JOIN c ON c.a = rt.a AND c.b = ct.b), "
            "x AS (SELECT sum(power(grid.n - grid.rn * grid.cn / tot.nn, "
            "2) / (grid.rn * grid.cn / tot.nn)) AS chi2, "
            "any_value(tot.nn) AS nn FROM grid, tot) "
            "SELECT round(x.chi2, 6) AS chi2, "
            "round(sqrt(x.chi2 / (x.nn * "
            "(least((SELECT count(*) FROM rt), "
            "(SELECT count(*) FROM ct)) - 1))), 6) AS cramers_v, "
            "CAST(x.nn AS BIGINT) AS n, "
            "CAST((SELECT count(*) FROM rt) AS BIGINT) AS n_lang, "
            "CAST((SELECT count(*) FROM ct) AS BIGINT) AS n_source "
            "FROM x"
        ),
        "stats_cohens_d": (
            # power sums in exact qty-cents ints; the variance algebra
            # is stated EXACTLY as the engine folds it ((ss - n m^2) /
            # (n-1) in the same float op order); reported means round
            # half-away in INT space (they sit on the cents/n grid)
            "WITH s AS (SELECT l_returnflag AS g, "
            "SUM(CAST(round(l_quantity * 100) AS HUGEINT)) AS s, "
            "SUM(CAST(round(l_quantity * 100) AS HUGEINT) * "
            "CAST(round(l_quantity * 100) AS HUGEINT)) AS ss, "
            "CAST(COUNT(*) AS HUGEINT) AS n FROM lineitem "
            "WHERE l_returnflag IN ('A', 'R') GROUP BY 1), "
            "a AS (SELECT n, s, ss, s / 100.0 / n AS m, "
            "(ss / 10000.0 - n * (s / 100.0 / n) * (s / 100.0 / n)) "
            "/ (n - 1) AS v FROM s WHERE g = 'A'), "
            "b AS (SELECT n, s, ss, s / 100.0 / n AS m, "
            "(ss / 10000.0 - n * (s / 100.0 / n) * (s / 100.0 / n)) "
            "/ (n - 1) AS v FROM s WHERE g = 'R'), "
            "sp AS (SELECT sqrt(((a.n - 1.0) * a.v + (b.n - 1.0) * b.v) "
            "/ (a.n + b.n - 2.0)) AS sp FROM a, b) "
            "SELECT CAST(a.n AS BIGINT) AS n_a, "
            "CAST(b.n AS BIGINT) AS n_b, "
            "((20000 * a.s + a.n) // (2 * a.n)) / 1000000.0 AS mean_a, "
            "((20000 * b.s + b.n) // (2 * b.n)) / 1000000.0 AS mean_b, "
            "round(sp.sp, 6) AS pooled_sd, "
            "round((a.m - b.m) / sp.sp, 6) AS cohens_d, "
            "round((a.m - b.m) / sp.sp * "
            "(1.0 - 3.0 / (4.0 * (a.n + b.n) - 9.0)), 6) AS hedges_g "
            "FROM a, b, sp"
        ),
        "embedding_silhouette": (
            # centroid coords = SUM/COUNT doubles (matching the engine's
            # s/n fold); per-vector s rounds to micro-ints via
            # round(s * 1e6) and folds EXACTLY; the per-label mean then
            # rounds half-AWAY sign-aware in int space
            "WITH e AS (SELECT vec_id, label, "
            "CAST(unnest(embedding) AS DOUBLE) AS v, "
            "generate_subscripts(embedding, 1) - 1 AS i "
            "FROM embeddings WHERE embedding IS NOT NULL "
            "AND label IS NOT NULL), "
            "cent AS (SELECT label, i, SUM(v) / COUNT(*) AS mu "
            "FROM e GROUP BY 1, 2), "
            "d2 AS (SELECT e.vec_id, e.label AS vlabel, cent.label AS "
            "clabel, sqrt(greatest(SUM((e.v - cent.mu) * "
            "(e.v - cent.mu)), 0.0)) AS dist "
            "FROM e JOIN cent ON cent.i = e.i GROUP BY 1, 2, 3), "
            "ab AS (SELECT vec_id, vlabel, "
            "MAX(CASE WHEN clabel = vlabel THEN dist END) AS a, "
            "MIN(CASE WHEN clabel <> vlabel THEN dist END) AS b "
            "FROM d2 GROUP BY 1, 2), "
            "s AS (SELECT vlabel AS label, CAST(round((b - a) / "
            "greatest(a, b) * 1000000) AS BIGINT) AS smu FROM ab), "
            "g AS (SELECT label, SUM(smu) AS sm, "
            "CAST(COUNT(*) AS BIGINT) AS n FROM s GROUP BY 1) "
            "SELECT CAST(label AS INTEGER) AS label, n, "
            "(CASE WHEN sm >= 0 THEN (2 * sm + n) // (2 * n) "
            "ELSE -((2 * (-sm) + n) // (2 * n)) END) / 1000000.0 "
            "AS mean_s FROM g ORDER BY label"
        ),
        "graph_jaccard_neighbors": (
            # same top-2000 co-purchase edge cut as adamic_adar; J =
            # common / (deg_x + deg_y - common); non-adjacent pairs
            # only; ORDER BY the ROUNDED score (integer ratios can land
            # exactly on 6dp halves — both sides round half-AWAY)
            "WITH li AS (SELECT DISTINCT l_orderkey AS g, "
            "l_partkey AS item FROM lineitem), "
            "p AS (SELECT x.item AS a, y.item AS b, "
            "CAST(count(*) AS BIGINT) AS cnt FROM li x "
            "JOIN li y ON x.g = y.g AND x.item < y.item GROUP BY 1, 2), "
            "e AS (SELECT a, b FROM p "
            "ORDER BY cnt DESC, a ASC, b ASC LIMIT 2000), "
            "und AS (SELECT a AS c, b AS n FROM e "
            "UNION ALL SELECT b, a FROM e), "
            "deg AS (SELECT c, CAST(count(*) AS BIGINT) AS d "
            "FROM und GROUP BY 1), "
            "w AS (SELECT u1.n AS x, u2.n AS y, "
            "CAST(count(*) AS BIGINT) AS cnt FROM und u1 "
            "JOIN und u2 ON u1.c = u2.c AND u1.n < u2.n GROUP BY 1, 2), "
            "jc AS (SELECT w.x, w.y, round(CAST(w.cnt AS DOUBLE) / "
            "(dx.d + dy.d - w.cnt), 6) AS jaccard FROM w "
            "JOIN deg dx ON dx.c = w.x JOIN deg dy ON dy.c = w.y), "
            "ne AS (SELECT jc.* FROM jc LEFT JOIN e "
            "ON e.a = jc.x AND e.b = jc.y WHERE e.a IS NULL) "
            "SELECT x AS node_a, y AS node_b, jaccard FROM ne "
            "ORDER BY jaccard DESC, node_a ASC, node_b ASC LIMIT 50"
        ),
        "text_flesch_hist": (
            # same whitespace tokenizer; sentences = [.!?]+ runs
            # floored at 1; syllables = vowel-group runs floored at one
            # per word IN AGGREGATE; the score expression mirrors the
            # engine's double op order exactly so the bucket floor
            # cannot split
            "WITH d AS (SELECT trim(text) AS tx FROM documents "
            "WHERE length(trim(text)) > 0), "
            "m AS (SELECT "
            "CAST(length(string_split_regex(tx, '\\s+')) AS BIGINT) AS w, "
            "greatest(CAST(length(regexp_extract_all(tx, '[.!?]+')) "
            "AS BIGINT), 1) AS s, "
            "CAST(length(regexp_extract_all(lower(tx), '[aeiouy]+')) "
            "AS BIGINT) AS vg FROM d), "
            "f AS (SELECT CAST(floor((206.835 - 1.015 * "
            "(w / CAST(s AS DOUBLE)) - 84.6 * (greatest(vg, w) / "
            "CAST(w AS DOUBLE))) / 10.0) AS BIGINT) AS bucket FROM m) "
            "SELECT bucket, CAST(count(*) AS BIGINT) AS n_docs "
            "FROM f GROUP BY 1 ORDER BY 1"
        ),
        "text_js_divergence": (
            # JSD in log2 over the shared unigram space; one-sided
            # tokens contribute p/2 (log2(p/(p/2)) = 1) via the same
            # CASE algebra the engine's dense pivot computes with zeros
            "WITH tok AS (SELECT source, "
            "unnest(string_split_regex(trim(text), '\\s+')) AS w "
            "FROM documents WHERE length(trim(text)) > 0), "
            "c AS (SELECT source, w, CAST(count(*) AS BIGINT) AS c "
            "FROM tok GROUP BY 1, 2), "
            "n AS (SELECT source, SUM(c) AS n FROM c GROUP BY 1), "
            "pairs AS (SELECT a.source AS sa, b.source AS sb "
            "FROM n a JOIN n b ON a.source < b.source), "
            "u AS (SELECT DISTINCT w FROM c), "
            "g AS (SELECT p.sa, p.sb, "
            "coalesce(ca.c, 0) AS c1, coalesce(cb.c, 0) AS c2, "
            "na.n AS n1, nb.n AS n2 "
            "FROM pairs p CROSS JOIN u "
            "LEFT JOIN c ca ON ca.source = p.sa AND ca.w = u.w "
            "LEFT JOIN c cb ON cb.source = p.sb AND cb.w = u.w "
            "JOIN n na ON na.source = p.sa "
            "JOIN n nb ON nb.source = p.sb "
            "WHERE coalesce(ca.c, 0) > 0 OR coalesce(cb.c, 0) > 0), "
            "t AS (SELECT sa, sb, "
            "(CASE WHEN c1 > 0 THEN (c1 / n1) * log2((c1 / n1) / "
            "((c1 / n1 + c2 / n2) / 2)) ELSE 0 END) + "
            "(CASE WHEN c2 > 0 THEN (c2 / n2) * log2((c2 / n2) / "
            "((c1 / n1 + c2 / n2) / 2)) ELSE 0 END) AS term FROM g) "
            "SELECT sa AS source_a, sb AS source_b, "
            "round(0.5 * SUM(term), 6) AS jsd FROM t "
            "GROUP BY 1, 2 ORDER BY 1, 2"
        ),
        "stats_hellinger": (
            # unit-width grid with round(6) BEFORE floor on both sides
            # (float-grid rule); exact int counts; only the final
            # sqrt(1 - BC) is float
            "WITH v AS (SELECT event_type AS g, "
            "CAST(floor(round(value, 6)) AS BIGINT) AS bucket "
            "FROM events WHERE event_type IN ('purchase', 'view') "
            "AND value IS NOT NULL AND NOT isnan(value)), "
            "c AS (SELECT g, bucket, CAST(count(*) AS BIGINT) AS n "
            "FROM v GROUP BY 1, 2), "
            "p AS (SELECT bucket, n FROM c WHERE g = 'purchase'), "
            "w AS (SELECT bucket, n FROM c WHERE g = 'view'), "
            "np AS (SELECT SUM(n) AS n FROM p), "
            "nv AS (SELECT SUM(n) AS n FROM w), "
            "bc AS (SELECT SUM(sqrt((coalesce(p.n, 0) / "
            "(SELECT n FROM np)) * (coalesce(w.n, 0) / "
            "(SELECT n FROM nv)))) AS bc "
            "FROM p FULL OUTER JOIN w ON p.bucket = w.bucket) "
            "SELECT CAST((SELECT n FROM np) AS BIGINT) AS n_purchase, "
            "CAST((SELECT n FROM nv) AS BIGINT) AS n_view, "
            "round(bc.bc, 6) AS bhattacharyya, "
            "round(sqrt(greatest(1.0 - bc.bc, 0.0)), 6) AS hellinger "
            "FROM bc"
        ),
        "events_dow_hour_heatmap": (
            "SELECT CAST(isodow(ts) AS BIGINT) AS dow, "
            "CAST(hour(ts) AS BIGINT) AS hour, "
            "CAST(count(*) AS BIGINT) AS n FROM events "
            "WHERE ts IS NOT NULL GROUP BY 1, 2 ORDER BY 1, 2"
        ),
        "dedup_semantic": (
            # the embedding_kmeans trajectory (rounded-6dp centroids,
            # one recenter) reproduced verbatim, then the SemDeDup
            # prune: drop any vector with round(cos, 6) >= 0.35 to a
            # LOWER-id member of its cluster
            "WITH c0 AS (SELECT vec_id AS cid, "
            "list_transform(CAST(embedding AS DOUBLE[]), "
            "x -> round(x, 6)) AS c FROM embeddings WHERE vec_id < 8), "
            "a1 AS (SELECT e.vec_id, e.embedding, c0.cid, "
            "row_number() OVER (PARTITION BY e.vec_id ORDER BY "
            "list_cosine_similarity(CAST(e.embedding AS DOUBLE[]), "
            "c0.c) DESC, c0.cid ASC) AS rn "
            "FROM embeddings e CROSS JOIN c0), "
            "m AS (SELECT vec_id, embedding, cid FROM a1 WHERE rn = 1), "
            "u AS (SELECT m.cid, t.i AS ord, "
            "round(avg(CAST(m.embedding[t.i] AS DOUBLE)), 6) AS v "
            "FROM m, generate_series(1, 64) AS t(i) "
            "GROUP BY m.cid, t.i), "
            "c1 AS (SELECT cid, list(v ORDER BY ord) AS c FROM u "
            "GROUP BY cid), "
            "cc AS (SELECT c0.cid, coalesce(c1.c, c0.c) AS c FROM c0 "
            "LEFT JOIN c1 ON c0.cid = c1.cid), "
            "a2 AS (SELECT e.vec_id, e.embedding, cc.cid, "
            "row_number() OVER (PARTITION BY e.vec_id ORDER BY "
            "list_cosine_similarity(CAST(e.embedding AS DOUBLE[]), "
            "cc.c) DESC, cc.cid ASC) AS rn "
            "FROM embeddings e CROSS JOIN cc), "
            "m2 AS (SELECT vec_id, embedding, cid FROM a2 WHERE rn = 1), "
            "drp AS (SELECT DISTINCT a.vec_id FROM m2 a JOIN m2 b "
            "ON a.cid = b.cid AND b.vec_id < a.vec_id "
            "AND round(list_cosine_similarity("
            "CAST(a.embedding AS DOUBLE[]), "
            "CAST(b.embedding AS DOUBLE[])), 6) >= 0.35) "
            "SELECT m2.vec_id, CAST(m2.cid AS BIGINT) AS cluster "
            "FROM m2 LEFT JOIN drp ON drp.vec_id = m2.vec_id "
            "WHERE drp.vec_id IS NULL ORDER BY m2.vec_id"
        ),
        "docs_dsir_weights": (
            # md5_u64 bucket bridge (same as text_hashed_features);
            # Laplace +1 over B=64 buckets; target = lang='en'; the
            # llr expression mirrors the engine's double op order
            "WITH tok AS (SELECT doc_id, lang, "
            "unnest(string_split_regex(trim(lower(text)), '\\s+')) AS w "
            "FROM documents WHERE text IS NOT NULL "
            "AND length(trim(text)) > 0), "
            "b AS (SELECT doc_id, lang, "
            "CAST(CAST(('0x' || substring(md5(w), 1, 16)) AS UBIGINT) "
            "% 64 AS BIGINT) AS bucket FROM tok), "
            "ct AS (SELECT bucket, CAST(count(*) AS BIGINT) AS c "
            "FROM b WHERE lang = 'en' GROUP BY 1), "
            "cr AS (SELECT bucket, CAST(count(*) AS BIGINT) AS c "
            "FROM b GROUP BY 1), "
            "nt AS (SELECT count(*) AS n FROM b WHERE lang = 'en'), "
            "nr AS (SELECT count(*) AS n FROM b), "
            "llr AS (SELECT cr.bucket, "
            "ln((coalesce(ct.c, 0) + 1) / ((SELECT n FROM nt) + 64.0)) "
            "- ln((cr.c + 1) / ((SELECT n FROM nr) + 64.0)) AS llr "
            "FROM cr LEFT JOIN ct ON ct.bucket = cr.bucket), "
            "s AS (SELECT b.doc_id, any_value(b.lang) AS lang, "
            "round(SUM(llr.llr), 6) AS dsir_w FROM b "
            "JOIN llr ON llr.bucket = b.bucket GROUP BY 1) "
            "SELECT doc_id, lang, dsir_w FROM s "
            "ORDER BY dsir_w DESC, doc_id ASC LIMIT 50"
        ),
        "graph_modularity": _modularity_sql(rounds=3),
        "graph_degree_hist": (
            "WITH li AS (SELECT DISTINCT l_orderkey AS g, "
            "l_partkey AS item FROM lineitem), "
            "p AS (SELECT x.item AS a, y.item AS b, "
            "CAST(count(*) AS BIGINT) AS cnt FROM li x "
            "JOIN li y ON x.g = y.g AND x.item < y.item GROUP BY 1, 2), "
            "e AS (SELECT a, b FROM p "
            "ORDER BY cnt DESC, a ASC, b ASC LIMIT 2000), "
            "und AS (SELECT a AS n FROM e UNION ALL SELECT b FROM e), "
            "d AS (SELECT n, CAST(count(*) AS BIGINT) AS degree "
            "FROM und GROUP BY 1) "
            "SELECT degree, CAST(count(*) AS BIGINT) AS n_nodes "
            "FROM d GROUP BY 1 ORDER BY 1"
        ),
        "join_q10_returns": (
            # returned-item revenue per customer over the 2000-Q1 order
            # window; exact cents x bp with half-away integer rounding
            # BEFORE the top-20 (ties break by custkey)
            "WITH r AS (SELECT o.o_custkey, "
            "SUM(CAST(round(l.l_extendedprice * 100) AS HUGEINT) * "
            "(100 - CAST(round(l.l_discount * 100) AS BIGINT))) AS rev "
            "FROM lineitem l JOIN orders o "
            "ON o.o_orderkey = l.l_orderkey "
            "WHERE l.l_returnflag = 'R' "
            "AND o.o_orderdate >= TIMESTAMP '2000-01-01 00:00:00' "
            "AND o.o_orderdate < TIMESTAMP '2000-04-01 00:00:00' "
            "GROUP BY 1) "
            "SELECT r.o_custkey AS c_custkey, c.c_name, n.n_name, "
            "((r.rev + 50) // 100) / 100.0 AS revenue FROM r "
            "JOIN customer c ON c.c_custkey = r.o_custkey "
            "JOIN nation n ON n.n_nationkey = c.c_nationkey "
            "ORDER BY ((r.rev + 50) // 100) DESC, r.o_custkey ASC "
            "LIMIT 20"
        ),
        "join_q14_promo": (
            # LEFT join so an unmatched partkey still counts in the
            # total (mirrors the engine's bitmap-miss semantics); the
            # percentage is rational -> integer half-away rounding
            "WITH f AS (SELECT l_partkey, "
            "CAST(round(l_extendedprice * 100) AS HUGEINT) * "
            "(100 - CAST(round(l_discount * 100) AS BIGINT)) AS rev "
            "FROM lineitem "
            "WHERE l_shipdate >= TIMESTAMP '2000-09-01 00:00:00' "
            "AND l_shipdate < TIMESTAMP '2000-10-01 00:00:00'), "
            "j AS (SELECT f.rev, "
            "coalesce(p.p_type = 'PROMO', false) AS pm FROM f "
            "LEFT JOIN part p ON p.p_partkey = f.l_partkey), "
            "s AS (SELECT coalesce(SUM(rev) FILTER (pm), 0) AS sp, "
            "coalesce(SUM(rev), 0) AS st FROM j) "
            "SELECT ((sp + 50) // 100) / 100.0 AS promo_revenue, "
            "((st + 50) // 100) / 100.0 AS total_revenue, "
            "CASE WHEN st = 0 THEN 0.0 ELSE "
            "((200000000 * sp + st) // (2 * st)) / 1000000.0 END "
            "AS promo_share_pct FROM s"
        ),
        "text_unigram_entropy": (
            # H = log2(N) - sum(c*log2(c))/N from exact counts; same
            # whitespace tokenizer; perplexity = pow(2, H)
            "WITH tok AS (SELECT source, "
            "unnest(string_split_regex(trim(text), '\\s+')) AS w "
            "FROM documents WHERE source IS NOT NULL "
            "AND text IS NOT NULL AND length(trim(text)) > 0), "
            "c AS (SELECT source, w, CAST(count(*) AS BIGINT) AS c "
            "FROM tok GROUP BY 1, 2), "
            "s AS (SELECT source, CAST(SUM(c) AS BIGINT) AS n, "
            "CAST(count(*) AS BIGINT) AS v, "
            "SUM(c * log2(CAST(c AS DOUBLE))) AS clogc "
            "FROM c GROUP BY 1) "
            "SELECT source, n AS n_tokens, v AS vocab, "
            "round(log2(CAST(n AS DOUBLE)) - clogc / n, 6) "
            "AS entropy_bits, "
            "round(pow(2.0, log2(CAST(n AS DOUBLE)) - clogc / n), 6) "
            "AS perplexity FROM s ORDER BY source"
        ),
        "multimodal_pixel_stats": (
            # the synth_decodable_payloads closed forms, NO decoder:
            # png/bmp v(r,c,ch) = (7r + 11c + 13ch + s) % 256 over
            # (s%11+1) x (s%13+1) x 3; wav sample(i) =
            # ((17i + s) % 65536) - 32768 over s%200+1 samples; jpeg
            # (grayscale baseline, DC-only blocks, q0=16) pixel =
            # clip(128 + 2*dc), dc = ((5*(r//8)+3*(c//8)+s)%201)-100
            "WITH d AS (SELECT doc_id, doc_id % 4 AS kind, "
            "doc_id // 4 AS s FROM documents), "
            "img AS (SELECT doc_id, s, (s % 13 + 1) AS w, "
            "(s % 11 + 1) AS h FROM d WHERE kind IN (0, 1)), "
            "ipx AS (SELECT i.doc_id, "
            "CAST((7 * r.r + 11 * c.c + 13 * ch.ch + i.s) % 256 "
            "AS BIGINT) AS v FROM img i, "
            "unnest(generate_series(0, i.h - 1)) AS r(r), "
            "unnest(generate_series(0, i.w - 1)) AS c(c), "
            "unnest(generate_series(0, 2)) AS ch(ch)), "
            "jpg AS (SELECT doc_id, s, (s % 3 + 1) * 8 AS w, "
            "(s % 2 + 1) * 8 AS h FROM d WHERE kind = 3), "
            "jpx AS (SELECT j.doc_id, CAST(LEAST(255, GREATEST(0, "
            "128 + 2 * (((5 * (r.r // 8) + 3 * (c.c // 8) + j.s) % 201)"
            " - 100))) AS BIGINT) AS v FROM jpg j, "
            "unnest(generate_series(0, j.h - 1)) AS r(r), "
            "unnest(generate_series(0, j.w - 1)) AS c(c)), "
            "istat AS (SELECT doc_id, 'image' AS kind, "
            "CAST(count(*) AS BIGINT) AS n_values, "
            "CAST(SUM(v) AS BIGINT) AS value_sum, MIN(v) AS value_min, "
            "MAX(v) AS value_max FROM "
            "(SELECT * FROM ipx UNION ALL SELECT * FROM jpx) "
            "GROUP BY 1), "
            "wav AS (SELECT doc_id, s, (s % 200 + 1) AS n FROM d "
            "WHERE kind = 2), "
            "wpx AS (SELECT w.doc_id, "
            "CAST(((17 * i.i + w.s) % 65536) - 32768 AS BIGINT) AS v "
            "FROM wav w, "
            "unnest(generate_series(0, w.n - 1)) AS i(i)), "
            "wstat AS (SELECT doc_id, 'audio' AS kind, "
            "CAST(count(*) AS BIGINT) AS n_values, "
            "CAST(SUM(v) AS BIGINT) AS value_sum, MIN(v) AS value_min, "
            "MAX(v) AS value_max FROM wpx GROUP BY 1) "
            "SELECT * FROM istat UNION ALL SELECT * FROM wstat "
            "ORDER BY doc_id"
        ),
        "multimodal_webp_meta": (
            # synth_webp_headers closed forms, NO parser: variant =
            # doc_id % 3 (0 lossy, 1 lossless, 2 extended), s =
            # doc_id // 3, w = s%300+1, h = s%200+1, alpha
            # (lossless/extended) = s%2
            "SELECT doc_id, 'webp' AS kind, "
            "CAST((doc_id // 3) % 300 + 1 AS BIGINT) AS width, "
            "CAST((doc_id // 3) % 200 + 1 AS BIGINT) AS height, "
            "CAST(CASE WHEN doc_id % 3 = 0 THEN 3 "
            "ELSE 3 + (doc_id // 3) % 2 END AS BIGINT) AS channels, "
            "CAST(8 AS BIGINT) AS bit_depth FROM documents"
        ),
        "multimodal_jpeg_stats": (
            # synth_jpeg_payloads closed form, NO decoder: grayscale
            # w = 8*(s%3+1), h = 8*(s%2+1); DC-only blocks with q0=16
            # decode to the constant clip(128 + 2*dc) per 8x8 block,
            # dc(by,bx) = ((5*by + 3*bx + s) % 201) - 100
            "WITH d AS (SELECT doc_id, doc_id AS s FROM documents), "
            "g AS (SELECT doc_id, s, (s % 3 + 1) * 8 AS w, "
            "(s % 2 + 1) * 8 AS h FROM d), "
            "px AS (SELECT i.doc_id, CAST(LEAST(255, GREATEST(0, "
            "128 + 2 * (((5 * (r.r // 8) + 3 * (c.c // 8) + i.s) % 201)"
            " - 100))) AS BIGINT) AS v FROM g i, "
            "unnest(generate_series(0, i.h - 1)) AS r(r), "
            "unnest(generate_series(0, i.w - 1)) AS c(c)) "
            "SELECT doc_id, 'image' AS kind, "
            "CAST(count(*) AS BIGINT) AS n_values, "
            "CAST(SUM(v) AS BIGINT) AS value_sum, MIN(v) AS value_min, "
            "MAX(v) AS value_max FROM px GROUP BY doc_id ORDER BY doc_id"
        ),
        "dedup_phash_groups": (
            # the same 16-bit integer aHash from the closed-form pixel
            # formulas (no decoder): png/bmp gray(r, c) = sum over ch of
            # (7r + 11c + 13ch + s) % 256; jpeg (grayscale) gray =
            # 3 * clip(128 + 2*dc(r//8, c//8)); sample grid r_i = i*h//4,
            # c_j = j*w//4; bit = gray * (w*h) > total gray
            "WITH d AS (SELECT doc_id, doc_id % 4 AS kind, "
            "doc_id // 4 AS s FROM documents WHERE doc_id % 4 <> 2), "
            "img AS (SELECT doc_id, kind, s, "
            "CASE WHEN kind = 3 THEN (s % 3 + 1) * 8 "
            "ELSE s % 13 + 1 END AS w, "
            "CASE WHEN kind = 3 THEN (s % 2 + 1) * 8 "
            "ELSE s % 11 + 1 END AS h FROM d), "
            "px AS (SELECT i.doc_id, r.r, c.c, "
            "CAST(CASE WHEN i.kind = 3 THEN 3 * LEAST(255, GREATEST(0, "
            "128 + 2 * (((5 * (r.r // 8) + 3 * (c.c // 8) + i.s) % 201)"
            " - 100))) ELSE "
            "(7 * r.r + 11 * c.c + i.s) % 256 "
            "+ (7 * r.r + 11 * c.c + 13 + i.s) % 256 "
            "+ (7 * r.r + 11 * c.c + 26 + i.s) % 256 END AS BIGINT) AS g "
            "FROM img i, "
            "unnest(generate_series(0, i.h - 1)) AS r(r), "
            "unnest(generate_series(0, i.w - 1)) AS c(c)), "
            "tot AS (SELECT doc_id, SUM(g) AS sg, "
            "CAST(count(*) AS BIGINT) AS n FROM px GROUP BY 1), "
            "bits AS (SELECT i.doc_id, bi.i + 4 * bj.j AS bit, "
            "CASE WHEN p.g * t.n > t.sg THEN 1 ELSE 0 END AS v "
            "FROM img i, unnest(generate_series(0, 3)) AS bi(i), "
            "unnest(generate_series(0, 3)) AS bj(j), px p, tot t "
            "WHERE p.doc_id = i.doc_id AND t.doc_id = i.doc_id "
            "AND p.r = (bj.j * i.h) // 4 "
            "AND p.c = (bi.i * i.w) // 4), "
            "hsh AS (SELECT doc_id, "
            "CAST(SUM(v * power(2, bit)) AS BIGINT) AS ahash "
            "FROM bits GROUP BY 1) "
            "SELECT ahash, CAST(count(*) AS BIGINT) AS n_docs, "
            "MIN(doc_id) AS min_doc_id FROM hsh GROUP BY 1 "
            "HAVING count(*) > 1 ORDER BY ahash"
        ),
        "text_fertility_by_lang": (
            # chars = total UNICODE length of the whitespace tokens;
            # empty tokens (edge whitespace surviving the space-only
            # trim) are filtered and the DOC universe is derived from
            # the same non-empty token stream, so both sides count
            # exactly the docs that tokenize to >= 1 token; ratios of
            # exact ints round half-away in integer space
            "WITH tok AS (SELECT doc_id, lang, w FROM (SELECT doc_id, "
            "lang, unnest(string_split_regex(trim(text), '\\s+')) AS w "
            "FROM documents WHERE lang IS NOT NULL "
            "AND text IS NOT NULL) WHERE w <> ''), "
            "tc AS (SELECT lang, CAST(count(*) AS HUGEINT) AS n_tokens, "
            "CAST(SUM(length(w)) AS HUGEINT) AS n_chars "
            "FROM tok GROUP BY 1), "
            "dc AS (SELECT lang, CAST(count(DISTINCT doc_id) "
            "AS HUGEINT) AS n_docs FROM tok GROUP BY 1) "
            "SELECT tc.lang, CAST(dc.n_docs AS BIGINT) AS n_docs, "
            "CAST(tc.n_tokens AS BIGINT) AS n_tokens, "
            "((2000000 * tc.n_chars + tc.n_tokens) "
            "// (2 * tc.n_tokens)) / 1000000.0 AS chars_per_token, "
            "((2000000 * tc.n_tokens + dc.n_docs) "
            "// (2 * dc.n_docs)) / 1000000.0 AS tokens_per_doc "
            "FROM tc JOIN dc ON dc.lang = tc.lang ORDER BY tc.lang"
        ),
        "docs_length_by_lang_quantiles": (
            "WITH a AS (SELECT lang, "
            "quantile_cont(CAST(n_chars AS DOUBLE), [0.5, 0.9, 0.99]) "
            "AS vs FROM documents WHERE lang IS NOT NULL "
            "AND n_chars IS NOT NULL GROUP BY 1) "
            "SELECT lang, unnest([0.5, 0.9, 0.99]) AS q, "
            "round(unnest(vs), 6) AS value FROM a"
        ),
        "events_stl_decomposition": (
            # trend = SUM over the 7-row centered window / 7.0 (full
            # windows only), seasonal = AVG detrended per isodow,
            # remainder RMS over the same mid days — mirrors the
            # engine's convolve/7 + per-dow mean algebra
            "WITH daily AS (SELECT "
            "CAST(epoch_us(ts) // 86400000000 AS BIGINT) AS day, "
            "SUM(value) AS v FROM events WHERE ts IS NOT NULL "
            "AND value IS NOT NULL AND NOT isnan(value) GROUP BY 1), "
            "t AS (SELECT day, v, "
            "SUM(v) OVER (ORDER BY day ROWS BETWEEN 3 PRECEDING AND "
            "3 FOLLOWING) / 7.0 AS trend, "
            "count(*) OVER (ORDER BY day ROWS BETWEEN 3 PRECEDING AND "
            "3 FOLLOWING) AS wn FROM daily), "
            "m AS (SELECT day, ((day + 3) % 7 + 1) AS dow, "
            "v - trend AS det FROM t WHERE wn = 7), "
            "s AS (SELECT dow, AVG(det) AS seasonal, "
            "CAST(count(*) AS BIGINT) AS n_days FROM m GROUP BY 1), "
            "r AS (SELECT sqrt(AVG(power(m.det - s.seasonal, 2))) "
            "AS rms FROM m JOIN s ON s.dow = m.dow) "
            "SELECT CAST(s.dow AS BIGINT) AS dow, s.n_days, "
            "round(s.seasonal, 6) AS seasonal, "
            "round((SELECT rms FROM r), 6) AS remainder_rms "
            "FROM s ORDER BY s.dow"
        ),
        "dedup_threshold_curve": (
            _SHINGLES
            + "SELECT t.tau AS threshold, "
            "CAST(count(jc.j) AS BIGINT) AS n_pairs FROM "
            "unnest([0.1, 0.2, 0.3, 0.4, 0.5, 0.6, 0.7, 0.8, 0.9]) "
            "AS t(tau) LEFT JOIN "
            "(SELECT round(CAST(c AS DOUBLE) / (sa.n + sb.n - c), 6) "
            "AS j FROM i JOIN sz sa ON sa.doc_id = i.a "
            "JOIN sz sb ON sb.doc_id = i.b) jc ON jc.j >= t.tau "
            "GROUP BY 1 ORDER BY 1"
        ),
        "events_decayed_engagement": (
            # same anchor (corpus max ts), same pow(2, -age_days/7)
            # double algebra; round(6) on an irrational sum
            "WITH m AS (SELECT max(ts) AS mt FROM events "
            "WHERE ts IS NOT NULL) "
            "SELECT event_type, CAST(count(*) AS BIGINT) AS n, "
            "round(sum(pow(2.0, -((epoch_us(m.mt) - epoch_us(ts)) / "
            "86400000000.0) / 7.0)), 6) AS decayed "
            "FROM events, m WHERE ts IS NOT NULL "
            "AND event_type IS NOT NULL GROUP BY event_type"
        ),
        "part_price_volume_bridge": (
            # exact integer sums; effects = one double division of the
            # exact integer product on both sides (compared within the
            # gate's relative tolerance)
            "WITH f AS (SELECT p.p_brand, "
            "CAST(year(l.l_shipdate) AS BIGINT) AS y, "
            "CAST(round(l.l_extendedprice * 100) AS BIGINT) AS rc, "
            "CAST(round(l.l_quantity * 100) AS BIGINT) AS vc "
            "FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey "
            "WHERE l.l_shipdate >= TIMESTAMP '1999-01-01 00:00:00' "
            "AND l.l_shipdate < TIMESTAMP '2001-01-01 00:00:00'), "
            "a AS (SELECT p_brand, "
            "CAST(sum(CASE WHEN y = 1999 THEN rc ELSE 0 END) AS HUGEINT)"
            " AS r1, "
            "CAST(sum(CASE WHEN y = 1999 THEN vc ELSE 0 END) AS HUGEINT)"
            " AS v1, "
            "CAST(sum(CASE WHEN y = 2000 THEN rc ELSE 0 END) AS HUGEINT)"
            " AS r2, "
            "CAST(sum(CASE WHEN y = 2000 THEN vc ELSE 0 END) AS HUGEINT)"
            " AS v2 FROM f GROUP BY 1) "
            "SELECT p_brand, r1 / 100.0 AS rev_1999, "
            "r2 / 100.0 AS rev_2000, "
            "CAST((v2 - v1) * r1 AS DOUBLE) / CAST(v1 AS DOUBLE) "
            "AS volume_effect_c, "
            "CAST(r2 - r1 AS DOUBLE) - "
            "CAST((v2 - v1) * r1 AS DOUBLE) / CAST(v1 AS DOUBLE) "
            "AS price_effect_c "
            "FROM a WHERE v1 > 0"
        ),
        "events_holt_backtest": (
            # the SAME update algebra, parenthesized identically:
            # l' = a*y + (1-a)*(l+b); b' = be*(l'-l) + (1-be)*b
            "WITH RECURSIVE d AS (SELECT CAST(ts AS DATE) AS day, "
            "sum(value) AS v FROM events WHERE ts IS NOT NULL "
            "AND value IS NOT NULL AND NOT isnan(value) GROUP BY 1), "
            "s AS (SELECT day, v, "
            "row_number() OVER (ORDER BY day) AS i FROM d), "
            "r AS (SELECT i, v, v AS l, CAST(0.0 AS DOUBLE) AS b, "
            "CAST(NULL AS DOUBLE) AS f FROM s WHERE i = 1 "
            "UNION ALL "
            "SELECT s.i, s.v, "
            "0.5 * s.v + 0.5 * (r.l + r.b) AS l, "
            "0.3 * ((0.5 * s.v + 0.5 * (r.l + r.b)) - r.l) "
            "+ 0.7 * r.b AS b, "
            "r.l + r.b AS f "
            "FROM r JOIN s ON s.i = r.i + 1) "
            "SELECT CAST(s2.day AS VARCHAR) AS day, round(r.v, 6) AS y, "
            "round(r.f, 6) AS forecast, round(r.v - r.f, 6) AS err "
            "FROM r JOIN s s2 ON s2.i = r.i WHERE r.f IS NOT NULL"
        ),
        "events_touch_attribution": (
            # equal split in exact integer micro space: each touch gets
            # (cents * 10^6) // k — identical truncation on both sides
            "WITH np_ AS (SELECT user_id, ts, event_type FROM events "
            "WHERE event_type <> 'purchase' AND user_id IS NOT NULL "
            "AND ts IS NOT NULL), "
            "conv AS (SELECT event_id, user_id, ts, "
            "CAST(round(value * 100) AS HUGEINT) AS cents FROM events "
            "WHERE event_type = 'purchase' AND value IS NOT NULL "
            "AND NOT isnan(value) "
            "AND user_id IS NOT NULL AND ts IS NOT NULL), "
            "tk AS (SELECT c.event_id AS cid, c.cents, e.event_type "
            "FROM conv c JOIN np_ e ON e.user_id = c.user_id "
            "AND e.ts < c.ts AND e.ts >= c.ts - INTERVAL 1 HOUR), "
            "kk AS (SELECT event_type, cents, "
            "count(*) OVER (PARTITION BY cid) AS k FROM tk) "
            "SELECT event_type, CAST(count(*) AS BIGINT) AS n_touches, "
            "CAST(sum((cents * 1000000) // k) AS BIGINT) "
            "AS attributed_micro FROM kk GROUP BY event_type"
        ),
        "events_window_dedup": (
            # first = rn 1 ordered by (ts, event_id); kept_id_sum pins
            # the exact argmin selection, not just counts
            "WITH r AS (SELECT event_type, event_id, "
            "row_number() OVER (PARTITION BY user_id, event_type, "
            "date_trunc('hour', ts) ORDER BY ts, event_id) AS rn, "
            "count(*) OVER (PARTITION BY user_id, event_type, "
            "date_trunc('hour', ts)) AS c FROM events "
            "WHERE user_id IS NOT NULL AND event_type IS NOT NULL "
            "AND ts IS NOT NULL AND event_id IS NOT NULL) "
            "SELECT event_type, CAST(count(*) AS BIGINT) AS n_windows, "
            "CAST(sum(c) AS BIGINT) AS n_events, "
            "CAST(sum(c) - count(*) AS BIGINT) AS n_suppressed, "
            "CAST(sum(event_id) AS BIGINT) AS kept_id_sum "
            "FROM r WHERE rn = 1 GROUP BY event_type"
        ),
        "orders_duplicate_invoices": (
            # same $1000 cents band, same customer, oriented o1 < o2
            "SELECT o1.o_orderkey AS o1_orderkey, "
            "o2.o_orderkey AS o2_orderkey, o1.o_custkey, "
            "CAST(abs(date_diff('day', CAST(o1.o_orderdate AS DATE), "
            "CAST(o2.o_orderdate AS DATE))) AS BIGINT) AS days_apart "
            "FROM orders o1 JOIN orders o2 "
            "ON o1.o_custkey = o2.o_custkey "
            "AND CAST(round(o1.o_totalprice * 100) AS BIGINT) // 100000 "
            "= CAST(round(o2.o_totalprice * 100) AS BIGINT) // 100000 "
            "AND o1.o_orderkey < o2.o_orderkey"
        ),
        "dedup_minhash_index": (
            # the SAME signature algebra as dedup_minhash_estimate,
            # plus banding: band key = the 4 signature values in i
            # order — candidates share a full band; queries are the
            # doc_id % 7 == 0 docs; self-matches excluded
            _SHINGLES
            + ", hx AS (SELECT doc_id, "
            "('0x' || substring(md5(g), 1, 16))::UBIGINT AS h FROM e), "
            "ii AS (SELECT unnest(generate_series(0, 15)) AS i), "
            "sig AS (SELECT hx.doc_id, ii.i, "
            "min(CAST(((2 * ii.i + 3)::HUGEINT * hx.h "
            "+ (1000003 * ii.i + 17)) % 18446744073709551616::HUGEINT "
            "% 2305843009213693951::HUGEINT AS UBIGINT)) AS mh "
            "FROM hx CROSS JOIN ii GROUP BY 1, 2), "
            "bk AS (SELECT doc_id, i // 4 AS band, "
            "string_agg(CAST(mh AS VARCHAR), '_' ORDER BY i) AS bs "
            "FROM sig GROUP BY 1, 2), "
            "cand AS (SELECT DISTINCT qa.doc_id AS a, x.doc_id AS b "
            "FROM bk qa JOIN bk x ON qa.band = x.band AND qa.bs = x.bs "
            "AND x.doc_id <> qa.doc_id WHERE qa.doc_id % 7 = 0), "
            "ag AS (SELECT cand.a, cand.b, "
            "CAST(sum(CASE WHEN sa.mh = sb.mh THEN 1 ELSE 0 END) "
            "AS BIGINT) AS n_match FROM cand "
            "JOIN sig sa ON sa.doc_id = cand.a "
            "JOIN sig sb ON sb.doc_id = cand.b AND sb.i = sa.i "
            "GROUP BY 1, 2) "
            "SELECT a, b, n_match, round(n_match / 16.0, 6) "
            "AS est_jaccard FROM ag WHERE n_match >= 8"
        ),
        "dedup_tile_coverage": (
            # same md5-64 tile identity as the engine; dup_frac rounds
            # half-away in exact integer micro space
            "WITH d AS (SELECT doc_id, text FROM documents "
            "WHERE length(text) >= 24), "
            "pos AS (SELECT doc_id, "
            "unnest(generate_series(1, length(text) - 23, 24)) AS p, "
            "text FROM d), "
            "t AS (SELECT doc_id, ('0x' || "
            "substring(md5(substring(text, p, 24)), 1, 16))::UBIGINT "
            "AS h FROM pos), "
            "cnt AS (SELECT h, count(*) AS c FROM t GROUP BY h), "
            "per AS (SELECT t.doc_id, CAST(count(*) AS BIGINT) AS nt, "
            "CAST(sum(CASE WHEN cnt.c >= 2 THEN 1 ELSE 0 END) "
            "AS BIGINT) AS nd FROM t JOIN cnt USING (h) "
            "GROUP BY t.doc_id) "
            "SELECT doc_id, nt AS n_tiles, nd AS n_dup_tiles, "
            "((2000000 * nd + nt) // (2 * nt)) / 1000000.0 AS dup_frac "
            "FROM per"
        ),
        "join_q7_volume": (
            # exact cents x bp revenue; 2dp via half-away integer
            # division (both revenues positive)
            "WITH q AS (SELECT s.s_nationkey AS sn, "
            "c.c_nationkey AS cn, "
            "CAST(year(l.l_shipdate) AS BIGINT) AS l_year, "
            "CAST(round(l.l_extendedprice * 100) AS HUGEINT) * "
            "(100 - CAST(round(l.l_discount * 100) AS BIGINT)) AS rev "
            "FROM lineitem l "
            "JOIN orders o ON o.o_orderkey = l.l_orderkey "
            "JOIN customer c ON c.c_custkey = o.o_custkey "
            "JOIN supplier s ON s.s_suppkey = l.l_suppkey "
            "WHERE ((s.s_nationkey IN (1, 6, 11) "
            "AND c.c_nationkey IN (2, 7, 12)) "
            "OR (s.s_nationkey IN (2, 7, 12) "
            "AND c.c_nationkey IN (1, 6, 11))) "
            "AND l.l_shipdate >= TIMESTAMP '1999-01-01 00:00:00' "
            "AND l.l_shipdate < TIMESTAMP '2001-01-01 00:00:00') "
            "SELECT 'NATION_' || CAST(sn AS VARCHAR) AS supp_nation, "
            "'NATION_' || CAST(cn AS VARCHAR) AS cust_nation, "
            "l_year, ((sum(rev) + 50) // 100) / 100.0 AS revenue "
            "FROM q GROUP BY sn, cn, l_year"
        ),
        "join_q8_market_share": (
            # share = num/den of exact cents x bp sums, rounded
            # half-away to 6dp in INTEGER micro space (den > 0 in every
            # emitted group)
            "WITH q AS (SELECT "
            "CAST(year(o.o_orderdate) AS BIGINT) AS o_year, "
            "CAST(round(l.l_extendedprice * 100) AS HUGEINT) * "
            "(100 - CAST(round(l.l_discount * 100) AS BIGINT)) AS rev, "
            "CASE WHEN s.s_nationkey = 3 THEN 1 ELSE 0 END AS tgt "
            "FROM lineitem l "
            "JOIN part p ON p.p_partkey = l.l_partkey "
            "AND p.p_type = 'ECONOMY' "
            "JOIN orders o ON o.o_orderkey = l.l_orderkey "
            "JOIN customer c ON c.c_custkey = o.o_custkey "
            "JOIN nation n ON n.n_nationkey = c.c_nationkey "
            "AND n.n_regionkey = 1 "
            "JOIN supplier s ON s.s_suppkey = l.l_suppkey "
            "WHERE o.o_orderdate >= TIMESTAMP '1999-01-01 00:00:00' "
            "AND o.o_orderdate < TIMESTAMP '2001-01-01 00:00:00') "
            "SELECT o_year, ((1000000 * sum(rev * tgt) + sum(rev) // 2)"
            " // sum(rev)) / 1000000.0 AS mkt_share "
            "FROM q GROUP BY o_year"
        ),
        "join_q9_profit": (
            # amount = ext*(100-disc) - retail_c*qty_c, both in exact
            # cents x 1/100 units; output is the int sum / 10^4 as a
            # double on BOTH sides (sums stay far inside 2^53, so the
            # int->double conversion and the division are bit-identical)
            "WITH q AS (SELECT s.s_nationkey AS sn, "
            "CAST(year(l.l_shipdate) AS BIGINT) AS o_year, "
            "CAST(round(l.l_extendedprice * 100) AS HUGEINT) * "
            "(100 - CAST(round(l.l_discount * 100) AS BIGINT)) - "
            "CAST(round(p.p_retailprice * 100) AS HUGEINT) * "
            "CAST(round(l.l_quantity * 100) AS BIGINT) AS amt "
            "FROM lineitem l "
            "JOIN part p ON p.p_partkey = l.l_partkey "
            "AND p.p_name LIKE '%red%' "
            "JOIN supplier s ON s.s_suppkey = l.l_suppkey) "
            "SELECT 'NATION_' || CAST(sn AS VARCHAR) AS nation, o_year, "
            "CAST(sum(amt) AS DOUBLE) / 10000.0 AS sum_profit "
            "FROM q GROUP BY sn, o_year"
        ),
        "join_q12_priority_class": (
            "SELECT l.l_returnflag, "
            "CAST(sum(CASE WHEN o.o_orderpriority IN "
            "('1-URGENT', '2-HIGH') THEN 1 ELSE 0 END) AS BIGINT) "
            "AS high_line_count, "
            "CAST(sum(CASE WHEN o.o_orderpriority IN "
            "('1-URGENT', '2-HIGH') THEN 0 ELSE 1 END) AS BIGINT) "
            "AS low_line_count "
            "FROM lineitem l JOIN orders o "
            "ON o.o_orderkey = l.l_orderkey "
            "WHERE l.l_shipdate >= TIMESTAMP '2000-01-01 00:00:00' "
            "AND l.l_shipdate < TIMESTAMP '2001-01-01 00:00:00' "
            "GROUP BY l.l_returnflag"
        ),
        "join_q13_custdist": (
            # LEFT OUTER so zero-order customers land in the k=0 bucket
            # (the engine synthesizes that bucket by subtraction)
            "SELECT CAST(c_count AS BIGINT) AS c_count, "
            "CAST(count(*) AS BIGINT) AS custdist FROM "
            "(SELECT c.c_custkey, count(o.o_orderkey) AS c_count "
            "FROM customer c LEFT OUTER JOIN orders o "
            "ON c.c_custkey = o.o_custkey "
            "AND o.o_orderpriority <> '1-URGENT' "
            "GROUP BY c.c_custkey) t GROUP BY c_count"
        ),
        "join_q15_top_supplier": (
            # ties on the EXACT integer revenue all survive; rounding
            # to 2dp happens after the max filter
            "WITH r AS (SELECT l_suppkey, "
            "SUM(CAST(round(l_extendedprice * 100) AS HUGEINT) * "
            "(100 - CAST(round(l_discount * 100) AS BIGINT))) AS rev "
            "FROM lineitem "
            "WHERE l_shipdate >= TIMESTAMP '2000-01-01 00:00:00' "
            "AND l_shipdate < TIMESTAMP '2000-04-01 00:00:00' "
            "GROUP BY l_suppkey) "
            "SELECT s.s_suppkey, s.s_name, "
            "((r.rev + 50) // 100) / 100.0 AS total_revenue "
            "FROM r JOIN supplier s ON s.s_suppkey = r.l_suppkey "
            "WHERE r.rev = (SELECT max(rev) FROM r)"
        ),
        "join_q20_dominant_supplier": (
            # half-share filter cross-multiplied on integral quantities
            "WITH pp AS (SELECT p_partkey FROM part "
            "WHERE p_type = 'PROMO'), "
            "lq AS (SELECT l_partkey, l_suppkey, "
            "SUM(CAST(round(l_quantity) AS BIGINT)) AS q FROM lineitem "
            "JOIN pp ON pp.p_partkey = l_partkey "
            "WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00' "
            "AND l_shipdate < TIMESTAMP '1998-01-01 00:00:00' "
            "GROUP BY 1, 2), "
            "t AS (SELECT l_partkey, SUM(q) AS tot FROM lq GROUP BY 1), "
            "w AS (SELECT lq.l_suppkey FROM lq "
            "JOIN t USING (l_partkey) WHERE 2 * lq.q > t.tot) "
            "SELECT s.s_name, CAST(count(*) AS BIGINT) AS n_parts "
            "FROM w JOIN supplier s ON s.s_suppkey = w.l_suppkey "
            "GROUP BY 1"
        ),
        "join_q2_min_cost_supplier": (
            # lineitem as the observed part-supplier relation (the q16
            # convention); unit cost = cents/qty in DOUBLE (integral
            # inputs, bit-identical division both sides); ties by
            # lower suppkey
            "WITH es AS (SELECT s_suppkey, s_name, s_acctbal, n_name "
            "FROM supplier s "
            "JOIN nation n ON n.n_nationkey = s.s_nationkey "
            "JOIN region r ON r.r_regionkey = n.n_regionkey "
            "WHERE r.r_name = 'EUROPE'), "
            "pp AS (SELECT p_partkey FROM part WHERE p_size = 15), "
            "u AS (SELECT l.l_partkey, l.l_suppkey, "
            "MIN(CAST(round(l.l_extendedprice * 100) AS DOUBLE) "
            "/ round(l.l_quantity)) AS unit FROM lineitem l "
            "JOIN pp ON pp.p_partkey = l.l_partkey "
            "JOIN es ON es.s_suppkey = l.l_suppkey GROUP BY 1, 2), "
            "w AS (SELECT *, row_number() OVER (PARTITION BY l_partkey "
            "ORDER BY unit, l_suppkey) AS rn FROM u) "
            "SELECT w.l_partkey AS p_partkey, es.s_name, es.n_name, "
            "es.s_acctbal, w.unit AS unit_cost FROM w "
            "JOIN es ON es.s_suppkey = w.l_suppkey WHERE rn = 1"
        ),
        "join_q11_important_parts": (
            # supplier nation-group s_nationkey % 5 = 3; keep parts
            # above 1.5x the average part value — cross-multiplied in
            # exact integer cents
            "WITH gs AS (SELECT s_suppkey FROM supplier "
            "WHERE s_nationkey % 5 = 3), "
            "v AS (SELECT l_partkey AS p_partkey, "
            "SUM(CAST(round(l_extendedprice * 100) AS HUGEINT)) AS "
            "cents FROM lineitem "
            "JOIN gs ON gs.s_suppkey = l_suppkey GROUP BY 1), "
            "t AS (SELECT SUM(cents) AS tot, "
            "CAST(count(*) AS HUGEINT) AS n FROM v) "
            "SELECT p_partkey, cents / 100.0 AS value FROM v, t "
            "WHERE 2 * n * cents > 3 * tot"
        ),
        "join_q21_waiting_supplier": (
            # late = shipped > 60 days after the order date; the lone
            # late supplier in a multi-supplier finished order
            "WITH f AS (SELECT o_orderkey, o_orderdate FROM orders "
            "WHERE o_orderstatus = 'F'), "
            "l AS (SELECT l_orderkey, l_suppkey, "
            "MAX(CASE WHEN l_shipdate > o_orderdate + INTERVAL 60 DAY "
            "THEN 1 ELSE 0 END) AS late FROM lineitem "
            "JOIN f ON o_orderkey = l_orderkey GROUP BY 1, 2), "
            "o AS (SELECT l_orderkey, CAST(count(*) AS BIGINT) AS "
            "n_supp, SUM(late) AS n_late FROM l GROUP BY 1), "
            "w AS (SELECT l.l_suppkey FROM l JOIN o USING (l_orderkey) "
            "WHERE o.n_supp >= 2 AND o.n_late = 1 AND l.late = 1) "
            "SELECT s.s_name, CAST(count(*) AS BIGINT) AS numwait "
            "FROM w JOIN supplier s ON s.s_suppkey = w.l_suppkey "
            "GROUP BY 1"
        ),
        "join_q22_global_sales": (
            # country code = c_custkey % 7 (no phone column); exact
            # cents; above-average filter cross-multiplied
            "WITH pos AS (SELECT c_custkey, "
            "CAST(round(c_acctbal * 100) AS BIGINT) AS cents "
            "FROM customer "
            "WHERE CAST(round(c_acctbal * 100) AS BIGINT) > 0), "
            "st AS (SELECT SUM(cents) AS sc, "
            "CAST(count(*) AS BIGINT) AS n FROM pos), "
            "cand AS (SELECT p.c_custkey % 7 AS cntrycode, p.cents "
            "FROM pos p, st s WHERE p.cents * s.n > s.sc "
            "AND NOT EXISTS (SELECT 1 FROM orders o "
            "WHERE o.o_custkey = p.c_custkey "
            "AND o.o_orderdate >= DATE '2000-01-01')) "
            "SELECT cntrycode, CAST(count(*) AS BIGINT) AS numcust, "
            "SUM(cents) / 100.0 AS totacctbal FROM cand GROUP BY 1"
        ),
        "join_q5_local_volume": (
            # customer-local suppliers, 1997 orders; exact cents x bp
            # revenue, 2dp via half-away integer division
            "WITH q AS (SELECT c.c_nationkey AS nk, "
            "CAST(round(l.l_extendedprice * 100) AS HUGEINT) * "
            "(100 - CAST(round(l.l_discount * 100) AS BIGINT)) AS rev "
            "FROM lineitem l "
            "JOIN orders o ON o.o_orderkey = l.l_orderkey "
            "JOIN customer c ON c.c_custkey = o.o_custkey "
            "JOIN supplier s ON s.s_suppkey = l.l_suppkey "
            "WHERE s.s_nationkey = c.c_nationkey "
            "AND o.o_orderdate >= DATE '1997-01-01' "
            "AND o.o_orderdate < DATE '1998-01-01') "
            "SELECT n.n_name, ((sum(rev) + 50) // 100) / 100.0 "
            "AS revenue FROM q "
            "JOIN nation n ON n.n_nationkey = q.nk GROUP BY 1"
        ),
        "join_q17_small_qty_revenue": (
            # integral quantities: the below-average filter
            # cross-multiplies exactly (5*q*cnt < sum_q); revenue in
            # exact cents, one float division at the end
            "WITH bp AS (SELECT p_partkey FROM part "
            "WHERE p_brand = 'Brand#13'), "
            "lq AS (SELECT l_partkey, "
            "CAST(round(l_quantity) AS BIGINT) AS qi, "
            "CAST(round(l_extendedprice * 100) AS HUGEINT) AS pc "
            "FROM lineitem JOIN bp ON p_partkey = l_partkey), "
            "st AS (SELECT l_partkey, SUM(qi) AS sq, "
            "CAST(count(*) AS BIGINT) AS cnt FROM lq GROUP BY 1) "
            "SELECT CAST(SUM(l.pc) AS DOUBLE) / 700.0 AS avg_yearly "
            "FROM lq l JOIN st ON st.l_partkey = l.l_partkey "
            "WHERE 5 * l.qi * st.cnt < st.sq"
        ),
        "join_q4_order_priority": (
            # late = shipped > 60 days after the order date (no
            # commit/receipt dates in this corpus)
            "WITH o AS (SELECT o_orderkey, o_orderdate, o_orderpriority "
            "FROM orders WHERE o_orderdate >= DATE '1997-07-01' "
            "AND o_orderdate < DATE '1997-10-01') "
            "SELECT o_orderpriority, CAST(count(*) AS BIGINT) AS "
            "order_count FROM o WHERE EXISTS (SELECT 1 FROM lineitem l "
            "WHERE l.l_orderkey = o.o_orderkey "
            "AND l.l_shipdate > o.o_orderdate + INTERVAL 60 DAY) "
            "GROUP BY 1"
        ),
        "join_q18_large_orders": (
            "WITH q AS (SELECT l_orderkey, "
            "CAST(round(SUM(l_quantity)) AS BIGINT) AS sum_qty "
            "FROM lineitem GROUP BY 1 "
            "HAVING CAST(round(SUM(l_quantity)) AS BIGINT) > 220) "
            "SELECT o.o_orderkey, o.o_custkey, o.o_totalprice, "
            "q.sum_qty FROM orders o JOIN q ON o.o_orderkey = q.l_orderkey"
        ),
        "join_q16_supplier_cnt": (
            # lineitem stands in for partsupp (no partsupp in this
            # corpus): distinct observed suppliers per part class
            "SELECT p.p_brand, p.p_type, "
            "CAST(p.p_size AS BIGINT) AS p_size, "
            "CAST(count(DISTINCT l.l_suppkey) AS BIGINT) "
            "AS supplier_cnt "
            "FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey "
            "WHERE p.p_brand <> 'Brand#1' AND p.p_type <> 'MEDIUM' "
            "AND p.p_size IN (1, 4, 9, 14, 19, 23, 36, 45) "
            "GROUP BY p.p_brand, p.p_type, p.p_size"
        ),
        "join_q19_disjunctive": (
            # SUM over zero rows is NULL with the row retained — the
            # engine mirrors that contract
            "SELECT ((SUM(CAST(round(l.l_extendedprice * 100) "
            "AS HUGEINT) * "
            "(100 - CAST(round(l.l_discount * 100) AS BIGINT))) + 50) "
            "// 100) / 100.0 AS revenue "
            "FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey "
            "WHERE (p.p_brand = 'Brand#12' "
            "AND CAST(round(l.l_quantity) AS BIGINT) BETWEEN 1 AND 11 "
            "AND p.p_size BETWEEN 1 AND 5) "
            "OR (p.p_brand = 'Brand#23' "
            "AND CAST(round(l.l_quantity) AS BIGINT) BETWEEN 10 AND 20 "
            "AND p.p_size BETWEEN 1 AND 10) "
            "OR (p.p_brand = 'Brand#34' "
            "AND CAST(round(l.l_quantity) AS BIGINT) BETWEEN 20 AND 30 "
            "AND p.p_size BETWEEN 1 AND 15)"
        ),
        "orders_qoq_growth": (
            # exact cents per calendar quarter; the QoQ percentage is
            # rational -> half-away integer rounding, sign-aware; the
            # first quarter reports NULL growth
            "WITH q AS (SELECT CAST(year(o_orderdate) AS BIGINT) "
            "AS year, CAST(quarter(o_orderdate) AS BIGINT) AS quarter, "
            "SUM(CAST(round(o_totalprice * 100) AS HUGEINT)) AS cents, "
            "CAST(count(*) AS BIGINT) AS n_orders FROM orders "
            "WHERE o_orderdate IS NOT NULL "
            "AND o_totalprice IS NOT NULL GROUP BY 1, 2), "
            "w AS (SELECT *, lag(cents) OVER "
            "(ORDER BY year, quarter) AS prev FROM q) "
            "SELECT year, quarter, cents / 100.0 AS revenue, n_orders, "
            "CASE WHEN prev IS NULL THEN NULL "
            "WHEN cents >= prev THEN "
            "((2 * (100000000 * (cents - prev)) + prev) // (2 * prev)) "
            "/ 1000000.0 ELSE "
            "-(((2 * (100000000 * (prev - cents)) + prev) // (2 * prev))"
            " / 1000000.0) END AS qoq_growth_pct "
            "FROM w ORDER BY year, quarter"
        ),
        "embedding_intrinsic_dim": (
            # the SAME |a|^2 - 2ab + |b|^2 algebra as the engine (via
            # list_inner_product), squared distances clipped at 0;
            # NN ties break by neighbor id; duplicates (r1 <= 1e-9)
            # excluded; ID = n / sum(0.5 * ln(r2/r1))
            "WITH e AS (SELECT vec_id, "
            "CAST(embedding AS DOUBLE[]) AS v FROM embeddings "
            "WHERE embedding IS NOT NULL), "
            "p AS (SELECT a.vec_id AS i, b.vec_id AS j, "
            "greatest(list_inner_product(a.v, a.v) "
            "- 2 * list_inner_product(a.v, b.v) "
            "+ list_inner_product(b.v, b.v), 0.0) AS d2 "
            "FROM e a JOIN e b ON a.vec_id <> b.vec_id), "
            "r AS (SELECT i, d2, row_number() OVER "
            "(PARTITION BY i ORDER BY d2, j) AS rn FROM p), "
            "nn AS (SELECT r1.i, r1.d2 AS r1, r2.d2 AS r2 "
            "FROM r r1 JOIN r r2 ON r1.i = r2.i "
            "AND r1.rn = 1 AND r2.rn = 2), "
            "s AS (SELECT CAST(count(*) AS BIGINT) AS n, "
            "SUM(0.5 * ln(r2 / r1)) AS t FROM nn WHERE r1 > 1e-9) "
            "SELECT n AS n_vectors, round(n / t, 6) AS intrinsic_dim "
            "FROM s"
        ),
        "events_changepoint": (
            "WITH daily AS (SELECT CAST(CAST(ts AS DATE) AS VARCHAR) AS day, "
            "CAST(COUNT(*) AS BIGINT) AS c FROM events "
            "WHERE ts IS NOT NULL GROUP BY 1), "
            "w AS (SELECT day, SUM(c) OVER (ORDER BY day) AS s, "
            "row_number() OVER (ORDER BY day) AS i, "
            "(SELECT CAST(SUM(c) AS DOUBLE) FROM daily) AS st, "
            "(SELECT COUNT(*) FROM daily) AS n FROM daily) "
            "SELECT day AS change_day, round(ABS(s - i * st / n), 6) "
            "AS cusum, CAST(n AS BIGINT) AS n_days FROM w "
            "ORDER BY ABS(s - i * st / n) DESC, day ASC LIMIT 1"
        ),
        "stats_mann_whitney": (
            # tie-average rank = rank() + (tie count - 1)/2; ranks are
            # multiples of 0.5 so the float rank sum is exact on both
            # sides. Tie term sums exactly as HUGEINT, ONE cast at the end.
            "WITH s AS (SELECT l_quantity AS v, l_returnflag AS g "
            "FROM lineitem WHERE l_returnflag IN ('A','N') "
            "AND l_quantity IS NOT NULL), "
            "r AS (SELECT g, rank() OVER (ORDER BY v) "
            "+ (count(*) OVER (PARTITION BY v) - 1) / 2.0 AS rk FROM s), "
            "agg AS (SELECT "
            "CAST(SUM(CASE WHEN g = 'A' THEN 1 ELSE 0 END) AS BIGINT) AS na, "
            "CAST(SUM(CASE WHEN g = 'N' THEN 1 ELSE 0 END) AS BIGINT) AS nb, "
            "SUM(CASE WHEN g = 'A' THEN rk ELSE 0 END) AS ra FROM r), "
            "ties AS (SELECT CAST(SUM(t * t * t - t) AS DOUBLE) AS tsum "
            "FROM (SELECT CAST(COUNT(*) AS BIGINT) AS t FROM s GROUP BY v)) "
            "SELECT round(ra - na * (na + 1) / 2.0, 6) AS u, "
            "round((ra - na * (na + 1) / 2.0 - na * nb / 2.0) "
            "/ sqrt(na * nb / 12.0 * ((na + nb + 1) "
            "- tsum / ((na + nb) * (na + nb - 1.0)))), 6) AS z, "
            "na AS n_a, nb AS n_b FROM agg, ties"
        ),
        "stats_kendall_tau": (
            # exact integer pair counts over the contingency grid (the
            # engine's 2-D suffix sums count the same pairs), one float
            # division at the end
            "WITH s AS (SELECT l_quantity AS a, l_discount AS b "
            "FROM lineitem WHERE l_quantity IS NOT NULL "
            "AND l_discount IS NOT NULL), "
            "cells AS (SELECT a, b, CAST(COUNT(*) AS BIGINT) AS n "
            "FROM s GROUP BY a, b), "
            "cd AS (SELECT "
            "CAST(COALESCE(SUM(CASE WHEN c2.b > c1.b THEN c1.n * c2.n END), 0) AS BIGINT) AS conc, "
            "CAST(COALESCE(SUM(CASE WHEN c2.b < c1.b THEN c1.n * c2.n END), 0) AS BIGINT) AS disc "
            "FROM cells c1 JOIN cells c2 ON c2.a > c1.a), "
            "tot AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM s), "
            "ta AS (SELECT CAST(SUM(t * (t - 1) // 2) AS BIGINT) AS t1 "
            "FROM (SELECT CAST(COUNT(*) AS BIGINT) AS t FROM s GROUP BY a)), "
            "tb AS (SELECT CAST(SUM(t * (t - 1) // 2) AS BIGINT) AS t2 "
            "FROM (SELECT CAST(COUNT(*) AS BIGINT) AS t FROM s GROUP BY b)) "
            "SELECT round((conc - disc) / sqrt("
            "CAST(n * (n - 1) // 2 - t1 AS DOUBLE) "
            "* CAST(n * (n - 1) // 2 - t2 AS DOUBLE)), 6) AS tau_b, n "
            "FROM cd, tot, ta, tb"
        ),
        "events_autocorr": (
            "WITH daily AS (SELECT date_trunc('day', ts) AS day, "
            "CAST(COUNT(*) AS BIGINT) AS c FROM events "
            "WHERE ts IS NOT NULL GROUP BY 1), "
            "lagged AS (SELECT c, "
            "LAG(c, 1) OVER (ORDER BY day) AS c1, "
            "LAG(c, 2) OVER (ORDER BY day) AS c2, "
            "LAG(c, 3) OVER (ORDER BY day) AS c3, "
            "LAG(c, 7) OVER (ORDER BY day) AS c7 FROM daily), "
            "n AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_days FROM daily) "
            "SELECT 1 AS lag, round(corr(c, c1), 6) AS acf, n_days FROM lagged, n GROUP BY n_days "
            "UNION ALL SELECT 2, round(corr(c, c2), 6), n_days FROM lagged, n GROUP BY n_days "
            "UNION ALL SELECT 3, round(corr(c, c3), 6), n_days FROM lagged, n GROUP BY n_days "
            "UNION ALL SELECT 7, round(corr(c, c7), 6), n_days FROM lagged, n GROUP BY n_days"
        ),
        "stats_ks_test": (
            "WITH s AS (SELECT l_quantity AS v, l_linestatus AS g "
            "FROM lineitem WHERE l_linestatus IN ('O','F') "
            "AND l_quantity IS NOT NULL), "
            "vals AS (SELECT v, "
            "SUM(CASE WHEN g = 'O' THEN 1 ELSE 0 END) AS ca, "
            "SUM(CASE WHEN g = 'F' THEN 1 ELSE 0 END) AS cb "
            "FROM s GROUP BY v), "
            "cum AS (SELECT "
            "CAST(SUM(ca) OVER (ORDER BY v) AS DOUBLE) "
            "/ (SELECT CAST(SUM(ca) AS DOUBLE) FROM vals) AS fa, "
            "CAST(SUM(cb) OVER (ORDER BY v) AS DOUBLE) "
            "/ (SELECT CAST(SUM(cb) AS DOUBLE) FROM vals) AS fb "
            "FROM vals) "
            "SELECT round(MAX(ABS(fa - fb)), 6) AS ks_d, "
            "(SELECT CAST(SUM(ca) AS BIGINT) FROM vals) AS n_a, "
            "(SELECT CAST(SUM(cb) AS BIGINT) FROM vals) AS n_b FROM cum"
        ),
        "dq_chi2_independence": (
            # the full r x c grid, INCLUDING zero-observed cells (a zero
            # cell still contributes E to the statistic) — the engine
            # pivots with fillna(0), so the oracle must too
            "WITH c AS (SELECT event_type AS a, dayofweek(ts) AS b, "
            "CAST(count(*) AS BIGINT) AS n FROM events "
            "WHERE event_type IS NOT NULL AND ts IS NOT NULL "
            "GROUP BY 1, 2), "
            "rt AS (SELECT a, sum(n) AS rn FROM c GROUP BY a), "
            "ct AS (SELECT b, sum(n) AS cn FROM c GROUP BY b), "
            "tot AS (SELECT sum(n) AS nn FROM c), "
            "grid AS (SELECT rt.a, ct.b, rt.rn, ct.cn, "
            "coalesce(c.n, 0) AS n FROM rt CROSS JOIN ct "
            "LEFT JOIN c ON c.a = rt.a AND c.b = ct.b) "
            "SELECT round(sum(power(grid.n - grid.rn * grid.cn / tot.nn, "
            "2) / (grid.rn * grid.cn / tot.nn)), 6) AS chi2, "
            "CAST((SELECT count(*) FROM rt) - 1 AS BIGINT) * "
            "CAST((SELECT count(*) FROM ct) - 1 AS BIGINT) AS dof, "
            "CAST(tot.nn AS BIGINT) AS n "
            "FROM grid, tot GROUP BY tot.nn"
        ),
        "text_gopher_rules": (
            "WITH w AS (SELECT doc_id, "
            "unnest(string_split(text, ' ')) AS w FROM documents), "
            "tot AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS nw, "
            "count(*) FILTER (WHERE w IN ('the', 'a')) AS ns "
            "FROM w GROUP BY 1), "
            "c AS (SELECT doc_id, w, count(*) AS n FROM w GROUP BY 1, 2), "
            "tp AS (SELECT doc_id, max(n) AS mx FROM c GROUP BY 1), "
            "d AS (SELECT d.doc_id, length(d.text) AS nc, tot.nw, tot.ns, "
            "tp.mx, "
            "(length(d.text) - (tot.nw - 1)) / CAST(tot.nw AS DOUBLE) "
            "AS ml, ns / CAST(tot.nw AS DOUBLE) AS sf, "
            "mx / CAST(tot.nw AS DOUBLE) AS tf "
            "FROM documents d JOIN tot USING (doc_id) "
            "JOIN tp USING (doc_id)) "
            "SELECT doc_id, nw AS n_words, round(ml, 6) AS mean_word_len, "
            "round(sf, 6) AS stop_frac, round(tf, 6) AS top_frac, "
            "nw >= 20 AS r_words, "
            "ml >= 3.0 AND ml <= 10.0 AS r_mean_len, "
            "sf >= 0.02 AS r_stop, tf <= 0.12 AS r_top, "
            "nw >= 20 AND ml >= 3.0 AND ml <= 10.0 AND sf >= 0.02 "
            "AND tf <= 0.12 AS pass_all FROM d"
        ),
        "join_min_price_supplier": (
            "WITH m AS (SELECT l_partkey, min(l_extendedprice) AS mp "
            "FROM lineitem GROUP BY 1), "
            "w AS (SELECT l.l_partkey, m.mp, min(l.l_suppkey) AS sk "
            "FROM lineitem l JOIN m ON l.l_partkey = m.l_partkey "
            "AND l.l_extendedprice = m.mp GROUP BY 1, 2) "
            "SELECT w.l_partkey AS partkey, round(w.mp, 2) AS min_price, "
            "w.sk AS suppkey, s.s_name AS supplier "
            "FROM w JOIN supplier s ON s.s_suppkey = w.sk"
        ),
        "join_small_qty_revenue": (
            # Q17 shape; 5*qty*cnt < sum is the EXACT form of
            # qty < 0.2*avg for integral quantities
            "WITH a AS (SELECT l_partkey, sum(l_quantity) AS s, "
            "count(*) AS c FROM lineitem GROUP BY 1) "
            "SELECT p.p_brand, "
            "round(sum(l.l_extendedprice) / 7.0, 2) AS avg_yearly "
            "FROM lineitem l JOIN a USING (l_partkey) "
            "JOIN part p ON p.p_partkey = l.l_partkey "
            "WHERE 5 * l.l_quantity * a.c < a.s GROUP BY 1"
        ),
        "join_large_qty_orders": (
            # Q18 shape; sum_qty is an exact integral double, ties break
            # by orderkey asc
            "WITH q AS (SELECT l_orderkey, sum(l_quantity) AS sum_qty "
            "FROM lineitem GROUP BY 1 HAVING sum(l_quantity) > 200) "
            "SELECT o.o_custkey AS c_custkey, c.c_name, o.o_orderkey, "
            "o.o_orderdate, o.o_totalprice, q.sum_qty "
            "FROM q JOIN orders o ON o.o_orderkey = q.l_orderkey "
            "JOIN customer c ON c.c_custkey = o.o_custkey "
            "ORDER BY q.sum_qty DESC, o.o_orderkey LIMIT 100"
        ),
        "part_association_rules": (
            # same distinct-(order, part) base and top-200 pair cut as
            # the copurchase queries; all ratios divide exact counts
            "WITH li AS (SELECT DISTINCT l_orderkey AS g, "
            "l_partkey AS item FROM lineitem), "
            "p AS (SELECT x.item AS a, y.item AS b, "
            "CAST(count(*) AS BIGINT) AS cnt FROM li x "
            "JOIN li y ON x.g = y.g AND x.item < y.item GROUP BY 1, 2), "
            "top AS (SELECT a, b, cnt FROM p "
            "ORDER BY cnt DESC, a ASC, b ASC LIMIT 200), "
            "i AS (SELECT item, CAST(count(*) AS BIGINT) AS n_item "
            "FROM li GROUP BY 1), "
            "n AS (SELECT CAST(count(DISTINCT g) AS DOUBLE) AS n_g "
            "FROM li) "
            "SELECT t.a AS item_a, t.b AS item_b, t.cnt AS n_both, "
            "round(t.cnt / n.n_g, 6) AS support, "
            "round(t.cnt * 1.0 / ia.n_item, 6) AS conf_a_b, "
            "round(t.cnt * 1.0 / ib.n_item, 6) AS conf_b_a, "
            "round(t.cnt * n.n_g / (ia.n_item * ib.n_item), 6) AS lift "
            "FROM top t JOIN i ia ON ia.item = t.a "
            "JOIN i ib ON ib.item = t.b, n "
            "ORDER BY lift DESC, item_a ASC, item_b ASC LIMIT 25"
        ),
        "events_daily_ohlc": (
            "WITH b AS (SELECT strftime(date_trunc('day', ts), "
            "'%Y-%m-%d') AS day, value, ts, event_id FROM events "
            "WHERE value IS NOT NULL AND NOT isnan(value) "
            "AND ts IS NOT NULL), "
            "r AS (SELECT day, value, row_number() OVER "
            "(PARTITION BY day ORDER BY ts, event_id) AS ra, "
            "row_number() OVER (PARTITION BY day ORDER BY ts DESC, "
            "event_id DESC) AS rd FROM b) "
            "SELECT day, max(CASE WHEN ra = 1 THEN value END) AS open, "
            "max(value) AS high, min(value) AS low, "
            "max(CASE WHEN rd = 1 THEN value END) AS close, "
            "CAST(count(*) AS BIGINT) AS n FROM r GROUP BY 1"
        ),
        "dq_candidate_keys": (
            " UNION ALL ".join(
                f"SELECT '{c}' AS col_name, "
                "CAST(count(*) AS BIGINT) AS n_rows, "
                f"CAST(count(DISTINCT {c}) AS BIGINT) AS n_distinct, "
                f"round(count(DISTINCT {c}) * 1.0 / count(*), 6) "
                "AS uniqueness, "
                f"count(DISTINCT {c}) = count(*) AS is_key FROM events"
                for c in ("event_id", "user_id", "event_type", "props")
            )
        ),
        "join_bloom_semi": (
            "SELECT l_returnflag, "
            "round(sum(l_extendedprice), 2) AS revenue, "
            "CAST(count(*) AS BIGINT) AS n_items "
            "FROM lineitem WHERE l_orderkey IN "
            "(SELECT o_orderkey FROM orders WHERE o_totalprice > 475000.0) "
            "GROUP BY l_returnflag"
        ),
        "events_conversion_window": (
            "SELECT a.user_id, CAST(count(*) AS BIGINT) AS n_pairs, "
            "min(epoch_us(b.ts) - epoch_us(a.ts)) AS min_delay_us, "
            "max(epoch_us(b.ts) - epoch_us(a.ts)) AS max_delay_us "
            "FROM events a JOIN events b ON a.user_id = b.user_id "
            "AND b.ts > a.ts "
            "AND epoch_us(b.ts) - epoch_us(a.ts) <= 86400000000 "
            "AND a.event_type = 'view' AND b.event_type = 'purchase' "
            "GROUP BY a.user_id"
        ),
        "windowed_session_agg": (
            "WITH o AS (SELECT user_id, ts, value, "
            "CASE WHEN epoch_us(ts) - epoch_us(lag(ts) OVER "
            "(PARTITION BY user_id ORDER BY ts)) > 1800000000 "
            "OR lag(ts) OVER (PARTITION BY user_id ORDER BY ts) IS NULL "
            "THEN 1 ELSE 0 END AS new_s FROM events), "
            "g AS (SELECT *, sum(new_s) OVER (PARTITION BY user_id "
            "ORDER BY ts ROWS UNBOUNDED PRECEDING) AS sid FROM o) "
            "SELECT user_id, min(ts) AS session_start, "
            "max(ts) AS session_end, count(*) AS n_events, "
            "round(sum(value), 3) AS sum_value "
            "FROM g GROUP BY user_id, sid"
        ),
        "topk_per_group": (
            "WITH r AS (SELECT event_type, event_id, value, row_number() "
            "OVER (PARTITION BY event_type ORDER BY value DESC, event_id ASC) "
            "AS rank FROM events) "
            "SELECT event_type, event_id, value, rank FROM r WHERE rank <= 5"
        ),
        "topk_per_user": (
            "WITH r AS (SELECT user_id, event_id, value, row_number() "
            "OVER (PARTITION BY user_id ORDER BY value DESC, event_id ASC) "
            "AS rank FROM events) "
            "SELECT user_id, event_id, value, rank FROM r WHERE rank <= 2"
        ),
        "windowed_agg": (
            "SELECT epoch_us(ts) // 3600000000 AS window, event_type, "
            "round(sum(value), 3) AS total_value, count(*) AS n "
            "FROM events GROUP BY 1, 2"
        ),
        "embedding_normalize": (
            "SELECT vec_id, CASE WHEN "
            "sqrt(list_sum(list_transform(CAST(embedding AS DOUBLE[]), "
            "x -> x * x))) > 0 THEN "
            "list_transform(CAST(embedding AS DOUBLE[]), x -> round(x / "
            "sqrt(list_sum(list_transform(CAST(embedding AS DOUBLE[]), "
            "y -> y * y))), 6)) "
            "ELSE list_transform(CAST(embedding AS DOUBLE[]), x -> 0.0) "
            "END AS embedding_unit FROM embeddings"
        ),
        "windowed_hopping_agg": (
            "SELECT (epoch_us(ts) // 3600000000 - o.off) AS window, "
            "event_type, round(sum(value), 3) AS total_value, "
            "count(*) AS n FROM events "
            "CROSS JOIN (VALUES (0), (1)) AS o(off) GROUP BY 1, 2"
        ),
        "dedup_exact": (
            "SELECT doc_id, text, lang, source, n_chars FROM ("
            "SELECT *, row_number() OVER (PARTITION BY text ORDER BY doc_id) "
            "AS rn FROM documents) WHERE rn = 1"
        ),
        "dedup_exact_semijoin": (
            # identical result set to dedup_exact — the query only swaps
            # the winner-filter execution strategy (driver broadcast ->
            # partitioned left-semi join), which must not change output
            "SELECT doc_id, text, lang, source, n_chars FROM ("
            "SELECT *, row_number() OVER (PARTITION BY text ORDER BY doc_id) "
            "AS rn FROM documents) WHERE rn = 1"
        ),
        "dedup_minhash": _jaccard_sql(0.5),
        "dedup_ngram_jaccard": _jaccard_sql(0.3),
        "dedup_containment": (
            _SHINGLES
            + "SELECT a, b, round(CAST(c AS DOUBLE) / least(sa.n, sb.n), "
            "6) AS containment "
            "FROM i JOIN sz sa ON sa.doc_id = i.a "
            "JOIN sz sb ON sb.doc_id = i.b "
            "WHERE CAST(c AS DOUBLE) / least(sa.n, sb.n) >= 0.5"
        ),
        "text_ngram_novelty": (
            # same shingle definition as _SHINGLES (3-gram over
            # lowercased \s+ tokens, short docs -> one whole-doc gram);
            # novelty = share of the doc's distinct shingles with
            # corpus df = 1
            "WITH t AS (SELECT doc_id, string_split_regex(trim("
            "lower(text)), '\\s+') AS tk FROM documents "
            "WHERE length(trim(text)) > 0), "
            "sh AS (SELECT doc_id, CASE WHEN len(tk) >= 3 THEN "
            "[tk[i] || ' ' || tk[i+1] || ' ' || tk[i+2] "
            "for i in generate_series(1, len(tk)-2)] "
            "ELSE [array_to_string(tk, ' ')] END AS gs FROM t), "
            "e AS (SELECT DISTINCT doc_id, unnest(gs) AS g FROM sh), "
            "df AS (SELECT g, CAST(count(*) AS BIGINT) AS df FROM e "
            "GROUP BY 1) "
            "SELECT e.doc_id, CAST(count(*) AS BIGINT) AS n_shingles, "
            "CAST(sum(CASE WHEN df.df = 1 THEN 1 ELSE 0 END) AS BIGINT) "
            "AS uniq_shingles, "
            "round(sum(CASE WHEN df.df = 1 THEN 1 ELSE 0 END) * 1.0 "
            "/ count(*), 6) AS novelty "
            "FROM e JOIN df USING (g) GROUP BY 1"
        ),
        "stats_multi_regression": (
            # CENTERED two-pass OLS, the identical algebra the engine
            # runs: raw power sums cancel ~8 leading digits at this row
            # count; centered moments agree to ~1e-12
            "WITH m AS (SELECT CAST(count(*) AS BIGINT) AS n, "
            "avg(l_quantity) AS m1, avg(l_discount) AS m2, "
            "avg(l_extendedprice) AS my FROM lineitem "
            "WHERE l_extendedprice IS NOT NULL "
            "AND l_quantity IS NOT NULL AND l_discount IS NOT NULL), "
            "s AS (SELECT m.n, m.m1, m.m2, m.my, "
            "sum((l_quantity - m1) * (l_quantity - m1)) AS s11, "
            "sum((l_discount - m2) * (l_discount - m2)) AS s22, "
            "sum((l_quantity - m1) * (l_discount - m2)) AS s12, "
            "sum((l_quantity - m1) * (l_extendedprice - my)) AS s1y, "
            "sum((l_discount - m2) * (l_extendedprice - my)) AS s2y, "
            "sum((l_extendedprice - my) * (l_extendedprice - my)) AS syy "
            "FROM lineitem, m WHERE l_extendedprice IS NOT NULL "
            "AND l_quantity IS NOT NULL AND l_discount IS NOT NULL "
            "GROUP BY 1, 2, 3, 4), "
            "b AS (SELECT *, "
            "(s1y * s22 - s2y * s12) / (s11 * s22 - s12 * s12) AS b1, "
            "(s2y * s11 - s1y * s12) / (s11 * s22 - s12 * s12) AS b2 "
            "FROM s) "
            "SELECT n, round(my - b1 * m1 - b2 * m2, 6) AS b0, "
            "round(b1, 6) AS b1, round(b2, 6) AS b2, "
            "round((b1 * s1y + b2 * s2y) / syy, 6) AS r2 FROM b"
        ),
        "sample_neyman": (
            # allocation kh = max(1, floor(300 * N_h*S_h / total)) over
            # strata with n >= 2 non-null values; selection = the shared
            # Lehmer permutation rank within each stratum
            "WITH s AS (SELECT event_type, "
            "CAST(count(value) AS BIGINT) AS n, sum(value) AS s, "
            "sum(value * value) AS ss FROM events "
            "WHERE value IS NOT NULL AND event_type IS NOT NULL "
            "GROUP BY 1), "
            "w AS (SELECT event_type, n * sqrt(greatest("
            "(ss - n * (s / n) * (s / n)) / (n - 1), 0)) AS wt "
            "FROM s WHERE n >= 2), "
            "tot AS (SELECT sum(wt) AS tw FROM w), "
            "a AS (SELECT event_type, greatest(1, CAST(floor("
            "300 * wt / tw) AS BIGINT)) AS kh FROM w, tot), "
            "p AS (SELECT event_type, event_id, "
            "CAST(((event_id % 2147483647) * (2654435761 % 2147483647) "
            "+ 12345) % 2147483647 AS BIGINT) AS perm FROM events), "
            "r AS (SELECT p.event_type, p.event_id, p.perm, "
            "ROW_NUMBER() OVER (PARTITION BY p.event_type "
            "ORDER BY p.perm, p.event_id) AS rank, a.kh FROM p "
            "JOIN a USING (event_type)) "
            "SELECT event_type, event_id, perm, CAST(rank AS BIGINT) "
            "AS rank FROM r WHERE rank <= kh"
        ),
        "dedup_clusters": (
            # transitive closure over the same >= 0.3 Jaccard pairs:
            # cluster_id = min reachable doc id (undirected)
            "WITH RECURSIVE "
            + _SHINGLES[len("WITH ") :].rstrip()
            + ", p AS (SELECT a, b FROM i "
            "JOIN sz sa ON sa.doc_id = i.a JOIN sz sb ON sb.doc_id = i.b "
            "WHERE CAST(c AS DOUBLE) / (sa.n + sb.n - c) >= 0.3), "
            "ed AS (SELECT a, b FROM p UNION SELECT b AS a, a AS b FROM p), "
            "reach(node, r) AS ("
            "SELECT a, a FROM (SELECT DISTINCT a FROM ed) "
            "UNION "
            "SELECT re.node, ed.b FROM reach re JOIN ed ON ed.a = re.r) "
            "SELECT node AS doc_id, min(r) AS cluster_id, "
            "node = min(r) AS keep FROM reach GROUP BY node"
        ),
        "dedup_keep_best": (
            # same transitive closure as dedup_clusters; winner per
            # cluster = longest doc, ties by min doc id
            "WITH RECURSIVE "
            + _SHINGLES[len("WITH ") :].rstrip()
            + ", p AS (SELECT a, b FROM i "
            "JOIN sz sa ON sa.doc_id = i.a JOIN sz sb ON sb.doc_id = i.b "
            "WHERE CAST(c AS DOUBLE) / (sa.n + sb.n - c) >= 0.3), "
            "ed AS (SELECT a, b FROM p UNION SELECT b AS a, a AS b FROM p), "
            "reach(node, r) AS ("
            "SELECT a, a FROM (SELECT DISTINCT a FROM ed) "
            "UNION "
            "SELECT re.node, ed.b FROM reach re JOIN ed ON ed.a = re.r), "
            "comp AS (SELECT node, min(r) AS cluster_id FROM reach "
            "GROUP BY node), "
            "w AS (SELECT comp.cluster_id, comp.node AS doc_id, "
            "d.n_chars, row_number() OVER (PARTITION BY comp.cluster_id "
            "ORDER BY d.n_chars DESC, comp.node ASC) AS rn "
            "FROM comp JOIN documents d ON d.doc_id = comp.node) "
            "SELECT cluster_id, doc_id, CAST(n_chars AS DOUBLE) AS score "
            "FROM w WHERE rn = 1"
        ),
        "dedup_keep_best_shuffle": (
            # identical result set to dedup_keep_best — the query only
            # forces the distributed label-attach branch (partitioned
            # hash join instead of driver broadcast)
            "WITH RECURSIVE "
            + _SHINGLES[len("WITH ") :].rstrip()
            + ", p AS (SELECT a, b FROM i "
            "JOIN sz sa ON sa.doc_id = i.a JOIN sz sb ON sb.doc_id = i.b "
            "WHERE CAST(c AS DOUBLE) / (sa.n + sb.n - c) >= 0.3), "
            "ed AS (SELECT a, b FROM p UNION SELECT b AS a, a AS b FROM p), "
            "reach(node, r) AS ("
            "SELECT a, a FROM (SELECT DISTINCT a FROM ed) "
            "UNION "
            "SELECT re.node, ed.b FROM reach re JOIN ed ON ed.a = re.r), "
            "comp AS (SELECT node, min(r) AS cluster_id FROM reach "
            "GROUP BY node), "
            "w AS (SELECT comp.cluster_id, comp.node AS doc_id, "
            "d.n_chars, row_number() OVER (PARTITION BY comp.cluster_id "
            "ORDER BY d.n_chars DESC, comp.node ASC) AS rn "
            "FROM comp JOIN documents d ON d.doc_id = comp.node) "
            "SELECT cluster_id, doc_id, CAST(n_chars AS DOUBLE) AS score "
            "FROM w WHERE rn = 1"
        ),
        "dedup_simhash": _simhash_sql(),
        "text_lang_id": _lang_id_sql(),
        "text_lang_confusion": (
            f"WITH p AS ({_lang_id_sql()}) "
            "SELECT d.lang, coalesce(p.pred_lang, 'unknown') AS pred_lang, "
            "CAST(count(*) AS BIGINT) AS n "
            "FROM p JOIN documents d USING (doc_id) "
            "WHERE d.lang IS NOT NULL GROUP BY 1, 2"
        ),
        "text_lang_mismatch": (
            f"WITH p AS ({_lang_id_sql()}) "
            "SELECT d.lang, CAST(count(*) AS BIGINT) AS n, "
            "CAST(sum(CASE WHEN p.pred_lang <> d.lang OR p.pred_lang "
            "IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_mismatch, "
            "round(sum(CASE WHEN p.pred_lang <> d.lang OR p.pred_lang "
            "IS NULL THEN 1 ELSE 0 END) * 1.0 / count(*), 6) "
            "AS mismatch_rate "
            "FROM p JOIN documents d USING (doc_id) "
            "WHERE d.lang IS NOT NULL GROUP BY 1"
        ),
        "text_fingerprint": (
            "SELECT doc_id, md5(array_to_string(string_split_regex(trim(text), "
            "'\\s+'), ' ')) AS fingerprint_md5 FROM documents"
        ),
        "text_tfidf_topterms": (
            "WITH tok AS (SELECT doc_id, unnest(string_split_regex("
            "trim(text), '\\s+')) AS term FROM documents "
            "WHERE length(trim(text)) > 0), "
            "tf AS (SELECT doc_id, term, count(*) AS tf FROM tok "
            "GROUP BY doc_id, term), "
            "df AS (SELECT term, count(DISTINCT doc_id) AS df FROM tok "
            "GROUP BY term), "
            "nn AS (SELECT count(*) AS nd FROM documents "
            "WHERE length(trim(text)) > 0), "
            "s AS (SELECT tf.doc_id, tf.term, tf.tf, "
            "round(tf.tf * ln(CAST(nd AS DOUBLE) / df.df), 6) AS score "
            "FROM tf JOIN df USING (term) CROSS JOIN nn), "
            "r AS (SELECT *, row_number() OVER (PARTITION BY doc_id "
            "ORDER BY score DESC, term ASC) AS rank FROM s) "
            "SELECT doc_id, term, tf, score, rank FROM r WHERE rank <= 3"
        ),
        "sample_stratified": (
            "SELECT doc_id, lang, source, n_chars FROM documents "
            "WHERE ('0x' || substring(md5(CAST(doc_id AS VARCHAR)), 1, 16))"
            "::UBIGINT % 1000000 < "
            "CASE lang WHEN 'en' THEN 800000 WHEN 'zh' THEN 500000 "
            "WHEN 'es' THEN 300000 ELSE 100000 END"
        ),
        "docs_curation_pipeline": (
            f"WITH dd AS (SELECT * FROM (SELECT *, row_number() OVER "
            "(PARTITION BY text ORDER BY doc_id) AS rn FROM documents) "
            "WHERE rn = 1), "
            "t AS (SELECT doc_id, lang, length(text) AS n_chars, "
            f"{_TOKENS} AS n_tokens, "
            "length(regexp_replace(text, '[^.,;:!?]', '', 'g')) AS n_punct "
            "FROM dd), "
            "m AS (SELECT doc_id, lang, CAST(n_tokens AS BIGINT) AS n_tokens, "
            "CAST(n_chars AS BIGINT) AS n_chars, "
            "CASE WHEN n_tokens > 0 THEN "
            "CAST(n_chars - (n_tokens - 1) AS DOUBLE) / n_tokens ELSE 0.0 END "
            "AS mean_token_len, "
            "CASE WHEN n_chars > 0 THEN CAST(n_punct AS DOUBLE) / n_chars "
            "ELSE 0.0 END AS punct_ratio FROM t), "
            "q AS (SELECT doc_id, lang, n_tokens, n_chars FROM m "
            "WHERE n_tokens >= 20 AND mean_token_len <= 12.0 "
            "AND punct_ratio <= 0.1 AND lang IN ('en','de','fr','es','zh')) "
            "SELECT * FROM q WHERE "
            "('0x' || substring(md5(CAST(doc_id AS VARCHAR)), 1, 16))"
            "::UBIGINT % 1000000 < "
            "CASE lang WHEN 'en' THEN 800000 WHEN 'zh' THEN 500000 "
            "WHEN 'es' THEN 300000 ELSE 100000 END"
        ),
        "docs_quality_filter": (
            f"WITH t AS (SELECT doc_id, lang, length(text) AS n_chars, "
            f"{_TOKENS} AS n_tokens, "
            "length(regexp_replace(text, '[^.,;:!?]', '', 'g')) AS n_punct "
            "FROM documents), "
            "m AS (SELECT doc_id, lang, CAST(n_tokens AS BIGINT) AS n_tokens, "
            "CAST(n_chars AS BIGINT) AS n_chars, "
            "CASE WHEN n_tokens > 0 THEN "
            "CAST(n_chars - (n_tokens - 1) AS DOUBLE) / n_tokens ELSE 0.0 END "
            "AS mean_token_len, "
            "CASE WHEN n_chars > 0 THEN CAST(n_punct AS DOUBLE) / n_chars "
            "ELSE 0.0 END AS punct_ratio FROM t) "
            "SELECT * FROM m WHERE n_tokens >= 20 AND mean_token_len <= 12.0 "
            "AND punct_ratio <= 0.1 AND lang IN ('en', 'de', 'fr', 'es')"
        ),
        "embedding_kmeans": (
            # one spherical-kmeans step: assign vs rounded init centroids,
            # recenter (element-wise mean, rounded 6dp), re-assign
            "WITH c0 AS (SELECT vec_id AS cid, "
            "list_transform(CAST(embedding AS DOUBLE[]), x -> round(x, 6)) "
            "AS c FROM embeddings WHERE vec_id < 8), "
            "a1 AS (SELECT e.vec_id, e.embedding, c0.cid, row_number() OVER "
            "(PARTITION BY e.vec_id ORDER BY list_cosine_similarity("
            "CAST(e.embedding AS DOUBLE[]), c0.c) DESC, c0.cid ASC) AS rn "
            "FROM embeddings e CROSS JOIN c0), "
            "m AS (SELECT vec_id, embedding, cid FROM a1 WHERE rn = 1), "
            "u AS (SELECT m.cid, t.i AS ord, "
            "round(avg(CAST(m.embedding[t.i] AS DOUBLE)), 6) AS v "
            "FROM m, generate_series(1, 64) AS t(i) GROUP BY m.cid, t.i), "
            "c1 AS (SELECT cid, list(v ORDER BY ord) AS c FROM u GROUP BY cid), "
            # empty clusters keep their c0 centroid
            "cc AS (SELECT c0.cid, coalesce(c1.c, c0.c) AS c FROM c0 "
            "LEFT JOIN c1 ON c0.cid = c1.cid), "
            "a2 AS (SELECT e.vec_id, cc.cid, row_number() OVER "
            "(PARTITION BY e.vec_id ORDER BY list_cosine_similarity("
            "CAST(e.embedding AS DOUBLE[]), cc.c) DESC, cc.cid ASC) AS rn "
            "FROM embeddings e CROSS JOIN cc) "
            "SELECT vec_id, cid AS cluster FROM a2 WHERE rn = 1"
        ),
        "ann_ivf_topk": (
            "WITH c AS (SELECT vec_id AS cid, embedding FROM embeddings "
            "WHERE vec_id < 8), "
            "a AS (SELECT e.vec_id, e.embedding, c.cid, row_number() OVER "
            "(PARTITION BY e.vec_id ORDER BY "
            "list_cosine_similarity(CAST(e.embedding AS DOUBLE[]), "
            "CAST(c.embedding AS DOUBLE[])) DESC, c.cid ASC) AS rn "
            "FROM embeddings e CROSS JOIN c), "
            "asgn AS (SELECT vec_id, embedding, cid FROM a WHERE rn = 1), "
            "q AS (SELECT vec_id AS query_id, embedding FROM embeddings "
            "WHERE vec_id < 10), "
            "qp AS (SELECT q.query_id, c.cid, row_number() OVER "
            "(PARTITION BY q.query_id ORDER BY "
            "list_cosine_similarity(CAST(q.embedding AS DOUBLE[]), "
            "CAST(c.embedding AS DOUBLE[])) DESC, c.cid ASC) AS rn "
            "FROM q CROSS JOIN c), "
            "probe AS (SELECT query_id, cid FROM qp WHERE rn <= 3), "
            "s AS (SELECT p.query_id, e.vec_id, "
            "list_cosine_similarity(CAST(q.embedding AS DOUBLE[]), "
            "CAST(e.embedding AS DOUBLE[])) AS score "
            "FROM probe p JOIN q ON q.query_id = p.query_id "
            "JOIN asgn e ON e.cid = p.cid), "
            "r AS (SELECT *, row_number() OVER "
            "(PARTITION BY query_id ORDER BY score DESC, vec_id ASC) AS rank "
            "FROM s) "
            "SELECT query_id, vec_id, rank FROM r WHERE rank <= 5"
        ),
        "ann_recall_eval": (
            "WITH sig AS (SELECT vec_id, embedding, "
            "CAST(embedding[1] > 0 AS INT) + CAST(embedding[2] > 0 AS INT) * 2 + "
            "CAST(embedding[3] > 0 AS INT) * 4 + CAST(embedding[4] > 0 AS INT) * 8 "
            "AS bkt FROM embeddings), "
            "q AS (SELECT * FROM sig WHERE vec_id < 10), "
            "bs AS (SELECT q.vec_id AS query_id, e.vec_id AS vec_id, "
            "list_cosine_similarity(CAST(q.embedding AS DOUBLE[]), "
            "CAST(e.embedding AS DOUBLE[])) AS score "
            "FROM q CROSS JOIN embeddings e), "
            "b AS (SELECT query_id, vec_id FROM (SELECT *, row_number() "
            "OVER (PARTITION BY query_id ORDER BY score DESC, vec_id ASC) "
            "AS rank FROM bs) WHERE rank <= 5), "
            "ls AS (SELECT q.vec_id AS query_id, e.vec_id AS vec_id, "
            "list_cosine_similarity(CAST(q.embedding AS DOUBLE[]), "
            "CAST(e.embedding AS DOUBLE[])) AS score "
            "FROM q JOIN sig e ON q.bkt = e.bkt), "
            "l AS (SELECT query_id, vec_id FROM (SELECT *, row_number() "
            "OVER (PARTITION BY query_id ORDER BY score DESC, vec_id ASC) "
            "AS rank FROM ls) WHERE rank <= 5), "
            "h AS (SELECT b.query_id, CAST(count(*) AS BIGINT) AS n "
            "FROM b JOIN l ON b.query_id = l.query_id "
            "AND b.vec_id = l.vec_id GROUP BY 1) "
            "SELECT qq.vec_id AS query_id, "
            "coalesce(h.n, 0) AS n_hits, "
            "round(coalesce(h.n, 0) / 5.0, 6) AS recall_at_5 "
            "FROM (SELECT vec_id FROM embeddings WHERE vec_id < 10) qq "
            "LEFT JOIN h ON h.query_id = qq.vec_id"
        ),
        "ann_lsh_topk": (
            "WITH sig AS (SELECT vec_id, embedding, "
            "CAST(embedding[1] > 0 AS INT) + CAST(embedding[2] > 0 AS INT) * 2 + "
            "CAST(embedding[3] > 0 AS INT) * 4 + CAST(embedding[4] > 0 AS INT) * 8 "
            "AS bkt FROM embeddings), "
            "q AS (SELECT * FROM sig WHERE vec_id < 10), "
            "s AS (SELECT q.vec_id AS query_id, e.vec_id AS vec_id, "
            "list_cosine_similarity(CAST(q.embedding AS DOUBLE[]), "
            "CAST(e.embedding AS DOUBLE[])) AS score "
            "FROM q JOIN sig e ON q.bkt = e.bkt), "
            "r AS (SELECT *, row_number() OVER "
            "(PARTITION BY query_id ORDER BY score DESC, vec_id ASC) AS rank FROM s) "
            "SELECT query_id, vec_id, rank FROM r WHERE rank <= 5"
        ),
        "cdc_prefix_lookup": _LWW
        + "SELECT event_type, user_id, lsn FROM ranked "
        "WHERE rn = 1 AND op <> 'd' AND event_type = 'click'",
        "cdc_key_range_scan": _LWW
        + "SELECT user_id, ts, event_type, value, props FROM ranked "
        "WHERE rn = 1 AND op <> 'd' AND user_id BETWEEN 100 AND 500",
        "cdc_secondary_index": _LWW
        + "SELECT event_type, user_id, lsn FROM ranked "
        "WHERE rn = 1 AND op <> 'd'",
        "cdc_zone_scan": _LWW
        + "SELECT user_id, ts, event_type, value, props FROM ranked "
        "WHERE rn = 1 AND op <> 'd' AND value >= 20.0 AND value <= 60.0",
        "cdc_lake_join": (
            f"WITH env AS ({_ENV}), "
            "wa AS (SELECT * FROM (SELECT *, row_number() OVER "
            "(PARTITION BY user_id ORDER BY lsn DESC) AS rn FROM env "
            "WHERE lsn % 2 = 0) WHERE rn = 1 AND op <> 'd'), "
            "wb AS (SELECT * FROM (SELECT *, row_number() OVER "
            "(PARTITION BY user_id ORDER BY lsn DESC) AS rn FROM env "
            "WHERE lsn % 2 = 1) WHERE rn = 1 AND op <> 'd') "
            "SELECT wa.user_id, wa.ts AS ts, wa.event_type AS event_type, "
            "wa.value AS value, wa.props AS props, wb.ts AS ts_r, "
            "wb.event_type AS event_type_r, wb.value AS value_r, "
            "wb.props AS props_r FROM wa JOIN wb USING (user_id)"
        ),
        "cdc_snapshot_join": (
            # the lake-join SQL pinned to lsn <= cut on BOTH sides (the
            # consistent-snapshot pair, not the drifting live states)
            f"WITH env AS ({_ENV}), "
            "c AS (SELECT max(event_id) // 2 AS cut FROM events), "
            "wa AS (SELECT * FROM (SELECT *, row_number() OVER "
            "(PARTITION BY user_id ORDER BY lsn DESC) AS rn FROM env "
            "WHERE lsn % 2 = 0 AND lsn <= (SELECT cut FROM c)) "
            "WHERE rn = 1 AND op <> 'd'), "
            "wb AS (SELECT * FROM (SELECT *, row_number() OVER "
            "(PARTITION BY user_id ORDER BY lsn DESC) AS rn FROM env "
            "WHERE lsn % 2 = 1 AND lsn <= (SELECT cut FROM c)) "
            "WHERE rn = 1 AND op <> 'd') "
            "SELECT wa.user_id, wa.ts AS ts, wa.event_type AS event_type, "
            "wa.value AS value, wa.props AS props, wb.ts AS ts_r, "
            "wb.event_type AS event_type_r, wb.value AS value_r, "
            "wb.props AS props_r FROM wa JOIN wb USING (user_id)"
        ),
        "cdc_key_erasure": _LWW
        + f"SELECT {lww_cols} FROM ranked WHERE rn = 1 AND op <> 'd' "
        "AND user_id >= 20",
        "cdc_transactional": (
            f"WITH env AS ({_ENV}), "
            "p AS (SELECT *, user_id % 8 AS part FROM env), "
            "c AS (SELECT *, count(*) OVER (PARTITION BY part) AS n, "
            "row_number() OVER (PARTITION BY part ORDER BY lsn) AS rn "
            "FROM p), "
            # the last (incomplete) tx per partition: 5 rows when the count
            # divides evenly (declared 6), else the n%5 remainder
            "kept AS (SELECT * FROM c WHERE rn <= n - "
            "(CASE WHEN n % 5 = 0 THEN 5 ELSE n % 5 END)), "
            "ranked AS (SELECT *, row_number() OVER "
            "(PARTITION BY user_id ORDER BY lsn DESC) AS rn2 FROM kept) "
            "SELECT user_id, ts, event_type, value, props, lsn "
            "FROM ranked WHERE rn2 = 1 AND op <> 'd'"
        ),
        "cdc_pk_update": (
            # rekey rule: live LWW winners with user_id % 10 = 3 move to
            # user_id + 1000001; the k-th rekey (ascending user_id)
            # carries the c-event lsn maxlsn + 2k + 2
            f"WITH env AS ({_ENV}), "
            "ranked AS (SELECT *, row_number() OVER "
            "(PARTITION BY user_id ORDER BY lsn DESC) AS rn FROM env), "
            "live AS (SELECT user_id, ts, event_type, value, props, lsn "
            "FROM ranked WHERE rn = 1 AND op <> 'd'), "
            "rk AS (SELECT *, row_number() OVER (ORDER BY user_id) - 1 "
            "AS k FROM live WHERE user_id % 10 = 3), "
            "mx AS (SELECT max(event_id) AS maxlsn FROM events) "
            "SELECT user_id, ts, event_type, value, props, lsn "
            "FROM live WHERE user_id % 10 <> 3 "
            "UNION ALL "
            "SELECT user_id + 1000001 AS user_id, ts, event_type, value, "
            "props, (SELECT maxlsn FROM mx) + 2 * k + 2 AS lsn FROM rk"
        ),
        "cdc_constraint_filter": (
            # the constrained stream: deletes pass, c/u events violating
            # (value >= 10 AND event_type NOT NULL) vanish before apply
            f"WITH env0 AS ({_ENV}), "
            "env AS (SELECT * FROM env0 WHERE op = 'd' OR "
            "(value >= 10 AND event_type IS NOT NULL)), "
            "ranked AS (SELECT *, row_number() OVER "
            "(PARTITION BY user_id ORDER BY lsn DESC) AS rn FROM env) "
            "SELECT user_id, ts, event_type, value, props, lsn "
            "FROM ranked WHERE rn = 1 AND op <> 'd'"
        ),
        "cdc_dead_letters": (
            # first-violated-rule reason in constraint declaration order:
            # the min rule is declared before not_null
            f"WITH env AS ({_ENV}) "
            "SELECT user_id, ts, event_type, value, props, op, lsn, "
            "CASE WHEN value < 10 THEN 'value:min' "
            "ELSE 'event_type:not_null' END AS reason FROM env "
            "WHERE op <> 'd' AND (value < 10 OR event_type IS NULL)"
        ),
        "cdc_tx_summary": (
            # re-derive the partition-local tx-of-5 structure: seq along
            # LSN order, tx_seq = seq//5, the last tx per partition
            # declared one event short (matching tx_tagged_envelopes)
            f"WITH env AS ({_ENV}), "
            "p AS (SELECT *, user_id % 8 AS part FROM env), "
            "c AS (SELECT *, count(*) OVER (PARTITION BY part) AS np, "
            "row_number() OVER (PARTITION BY part ORDER BY lsn) - 1 "
            "AS seq FROM p), "
            "t AS (SELECT part, seq // 5 AS tx_seq, lsn, np FROM c), "
            "s AS (SELECT CAST(part AS BIGINT) * 1000000000 + tx_seq "
            "AS tx_id, CAST(count(*) AS BIGINT) AS n_events, "
            "CAST(CASE WHEN tx_seq = (max(np) - 1) // 5 "
            "THEN max(np) - 5 * ((max(np) - 1) // 5) + 1 "
            "ELSE 5 END AS BIGINT) AS declared, "
            "CAST(min(lsn) AS BIGINT) AS first_lsn, "
            "CAST(max(lsn) AS BIGINT) AS last_lsn "
            "FROM t GROUP BY part, tx_seq) "
            "SELECT tx_id, n_events, declared, first_lsn, last_lsn, "
            "n_events = declared AS complete FROM s"
        ),
        "cdc_composite_key": (
            f"WITH env AS ({_ENV}), "
            # the key's event_type component: deletes take it from the
            # before image = the user's previous event row (lag over ALL
            # events per user, any op — before is the prior row's payload)
            "k AS (SELECT *, CASE WHEN op = 'd' THEN "
            "lag(event_type) OVER (PARTITION BY user_id ORDER BY lsn) "
            "ELSE event_type END AS et_k FROM env), "
            "ranked AS (SELECT *, row_number() OVER "
            "(PARTITION BY user_id, et_k ORDER BY lsn DESC) AS rn "
            "FROM k WHERE et_k IS NOT NULL) "
            "SELECT user_id, ts, et_k AS event_type, value, props, lsn "
            "FROM ranked WHERE rn = 1 AND op <> 'd'"
        ),
        "cdc_incremental_agg": _LWW
        + "SELECT event_type, CAST(count(*) AS BIGINT) AS n, "
        "sum(value) AS total FROM ranked WHERE rn = 1 AND op <> 'd' "
        "GROUP BY event_type",
        "text_repetition": (
            # trim charset matches the engine's whitespace trim for ASCII
            # (DuckDB's bare trim() strips spaces only — a leading \t or \n
            # would create a phantom empty token on the SQL side)
            "WITH t AS (SELECT doc_id, string_split_regex(trim(text, "
            "' ' || chr(9) || chr(10) || chr(13) || chr(11) || chr(12)), "
            "'\\s+') AS tk FROM documents), "
            "g AS (SELECT doc_id, CASE WHEN len(tk) >= 2 THEN "
            "[tk[i] || ' ' || tk[i+1] for i in generate_series(1, len(tk)-1)] "
            "ELSE [] END AS grams FROM t) "
            "SELECT doc_id, CAST(len(grams) AS BIGINT) AS n_grams, "
            "CAST(len(list_distinct(grams)) AS BIGINT) AS n_distinct, "
            "CASE WHEN len(grams) > 0 THEN 1.0 - "
            "CAST(len(list_distinct(grams)) AS DOUBLE) / len(grams) "
            "ELSE 0.0 END AS dup_frac FROM g"
        ),
        "text_pii_redact": (
            "WITH inj AS (SELECT doc_id, text || ' ' || 'contact user' || "
            "doc_id || '@mail-' || (doc_id % 7) || '.com or +1 555 00' || "
            "doc_id || ' from 10.0.' || (doc_id % 256) || '.5' AS t "
            "FROM documents) "
            "SELECT doc_id, regexp_replace(regexp_replace(regexp_replace("
            "regexp_replace(t, "
            "'[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}', '<EMAIL>', 'g'), "
            "'\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b', '<IP>', 'g'), "
            "'\\+\\d[\\d ()-]{6,16}\\d', '<PHONE>', 'g'), "
            "'\\b\\d{4}[ -]?\\d{4}[ -]?\\d{4}[ -]?\\d{1,7}\\b', '<CARD>', 'g') "
            "AS text_redacted FROM inj"
        ),
        "text_line_dedup": (
            "WITH d2 AS (SELECT doc_id, text || chr(10) || 'footer-' || "
            "source || chr(10) || 'promo-' || (doc_id % 3) AS text "
            "FROM documents), "
            "segs AS (SELECT doc_id, "
            "unnest(string_split(text, chr(10))) AS seg, "
            "unnest(generate_series(1, len(string_split(text, chr(10))))) AS i "
            "FROM d2), "
            "freq AS (SELECT seg FROM (SELECT seg, "
            "count(DISTINCT doc_id) AS nd FROM segs GROUP BY seg) "
            "WHERE nd >= 10), "
            "kept AS (SELECT * FROM segs WHERE seg NOT IN "
            "(SELECT seg FROM freq)), "
            "r AS (SELECT doc_id, string_agg(seg, chr(10) ORDER BY i) "
            "AS text_clean FROM kept GROUP BY doc_id) "
            "SELECT d2.doc_id, coalesce(r.text_clean, '') AS text_clean "
            "FROM d2 LEFT JOIN r USING (doc_id)"
        ),
        "url_canonicalize": _URL_CANON
        + "SELECT doc_id, url_canon, domain FROM canon",
        "url_domain_stats": _URL_CANON
        + "SELECT domain, CAST(count(*) AS BIGINT) AS n_docs, "
        "CAST(sum(n_chars) AS BIGINT) AS chars_total "
        "FROM canon GROUP BY domain",
        "text_token_count": (
            f"SELECT doc_id, {_TOKENS} AS n_tokens FROM documents"
        ),
        "sample_language_mix": (
            "SELECT doc_id, lang FROM (SELECT doc_id, lang, "
            "row_number() OVER (PARTITION BY lang ORDER BY ('0x' || "
            "substring(md5(CAST(doc_id AS VARCHAR)), 1, 16))::UBIGINT, "
            "doc_id) AS rn FROM documents) "
            "WHERE rn <= CASE lang WHEN 'en' THEN 120 WHEN 'zh' THEN 60 "
            "WHEN 'es' THEN 40 ELSE 10 END"
        ),
        "approx_distinct_users": (
            "WITH h AS (SELECT DISTINCT ('0x' || "
            "substring(md5(CAST(user_id AS VARCHAR)), 1, 16))::UBIGINT AS hv "
            "FROM events WHERE user_id IS NOT NULL), "
            "kk AS (SELECT hv FROM h ORDER BY hv LIMIT 128), "
            "a AS (SELECT CAST(count(*) AS BIGINT) AS kc, max(hv) AS hk "
            "FROM kk) "
            "SELECT CASE WHEN kc < 128 THEN CAST(kc AS DOUBLE) "
            "ELSE (128 - 1) * power(2.0, 64) / CAST(hk AS DOUBLE) END "
            "AS estimate, kc AS k, coalesce(hk, 0) AS h_k FROM a"
        ),
        "dq_fk_orphans": (
            "SELECT DISTINCT user_id FROM events e WHERE user_id IS NOT NULL "
            "AND NOT EXISTS (SELECT 1 FROM customer c "
            "WHERE c.c_custkey = e.user_id AND c.c_custkey % 10 <> 0)"
        ),
        "dq_profile": (
            "SELECT 'doc_id' AS column, count(*) AS n_rows, "
            "count(*) - count(doc_id) AS n_nulls, "
            "CAST(min(doc_id) AS VARCHAR) AS min_v, "
            "CAST(max(doc_id) AS VARCHAR) AS max_v FROM documents "
            "UNION ALL SELECT 'lang', count(*), count(*) - count(lang), "
            "min(lang), max(lang) FROM documents "
            "UNION ALL SELECT 'source', count(*), count(*) - count(source), "
            "min(source), max(source) FROM documents "
            "UNION ALL SELECT 'n_chars', count(*), count(*) - count(n_chars), "
            "CAST(min(n_chars) AS VARCHAR), CAST(max(n_chars) AS VARCHAR) "
            "FROM documents"
        ),
        # format round-trips: identical result to the parquet route
        "source_jsonl": (
            f"SELECT doc_id, {_TOKENS} AS n_tokens FROM documents"
        ),
        "source_csv": (
            f"SELECT doc_id, {_TOKENS} AS n_tokens FROM documents"
        ),
        "corpus_token_stats": (
            f"WITH t AS (SELECT {_TOKENS} AS n_tokens FROM documents), "
            "c AS (SELECT n_tokens, count(*) AS cnt FROM t GROUP BY 1), "
            "s AS (SELECT n_tokens, SUM(cnt) OVER (ORDER BY n_tokens) AS cum "
            "FROM c), "
            "n AS (SELECT count(*) AS n_docs, "
            "CAST(sum(n_tokens) AS BIGINT) AS total_tokens FROM t) "
            "SELECT n_docs, total_tokens, "
            "(SELECT min(n_tokens) FROM s WHERE cum >= CEIL(0.5 * n_docs)) AS p50, "
            "(SELECT min(n_tokens) FROM s WHERE cum >= CEIL(0.9 * n_docs)) AS p90, "
            "(SELECT min(n_tokens) FROM s WHERE cum >= CEIL(0.99 * n_docs)) AS p99 "
            "FROM n"
        ),
        "text_normalize": (
            "WITH r AS (SELECT doc_id, trim(regexp_replace(regexp_replace("
            "text, '[\\x00-\\x1f\\x7f]', ' ', 'g'), ' {2,}', ' ', 'g')) "
            "AS text_norm FROM documents) "
            "SELECT doc_id, text_norm, "
            "CAST(length(text_norm) AS BIGINT) AS n_chars_norm FROM r"
        ),
        "join_broadcast_enrich": (
            "SELECT c_mktsegment, round(sum(o_totalprice), 2) AS revenue, "
            "count(*) AS n_orders FROM orders "
            "JOIN customer ON o_custkey = c_custkey GROUP BY c_mktsegment"
        ),
        "join_shuffle_revenue": (
            "SELECT o_orderpriority, "
            "round(sum(l_extendedprice * (1.0 - l_discount)), 2) AS revenue, "
            "count(*) AS n_items FROM orders "
            "JOIN lineitem ON o_orderkey = l_orderkey "
            "GROUP BY o_orderpriority"
        ),
        "join_salted_revenue": (
            # identical result to join_shuffle_revenue — salting is an
            # execution-strategy switch, the joined SET may not change
            "SELECT o_orderpriority, "
            "round(sum(l_extendedprice * (1.0 - l_discount)), 2) AS revenue, "
            "count(*) AS n_items FROM orders "
            "JOIN lineitem ON o_orderkey = l_orderkey "
            "GROUP BY o_orderpriority"
        ),
        "events_funnel": (
            "WITH f AS (SELECT user_id, min(event_id) AS fo FROM events "
            "WHERE event_type = 'click' GROUP BY user_id), "
            "t AS (SELECT user_id, max(event_id) AS mo FROM events "
            "WHERE event_type = 'purchase' GROUP BY user_id) "
            "SELECT f.user_id FROM f JOIN t USING (user_id) WHERE t.mo > f.fo"
        ),
        "distinct_users_per_type": (
            "SELECT event_type, count(DISTINCT user_id) AS n_distinct "
            "FROM events GROUP BY event_type"
        ),
        "cdc_scd2_history": (
            "WITH v AS (SELECT user_id, event_id AS valid_from, "
            "lead(event_id) OVER (PARTITION BY user_id ORDER BY event_id) "
            "AS valid_to, value, event_id % 10 AS m FROM events) "
            "SELECT user_id, valid_from, valid_to, value, "
            "(valid_to IS NULL) AS is_current FROM v WHERE m <> 0"
        ),
        "events_running_total": (
            "SELECT user_id, event_id, value, "
            "round(sum(value) OVER (PARTITION BY user_id ORDER BY event_id "
            "ROWS UNBOUNDED PRECEDING), 3) AS run_total FROM events"
        ),
        "events_anomaly": (
            "WITH s AS (SELECT event_type, avg(value) AS mu, "
            "stddev_pop(value) AS sd FROM events GROUP BY event_type) "
            "SELECT e.event_id, e.event_type, e.value, "
            "round((e.value - s.mu) / s.sd, 3) AS z FROM events e "
            "JOIN s USING (event_type) "
            "WHERE abs((e.value - s.mu) / s.sd) > 3.0"
        ),
        "text_unigram_logprob": (
            "WITH tok AS (SELECT doc_id, unnest(string_split_regex("
            "trim(text), '\\s+')) AS term FROM documents "
            "WHERE length(trim(text)) > 0), "
            "tf AS (SELECT term, count(*) AS tf FROM tok GROUP BY term), "
            "tot AS (SELECT count(*) AS t FROM tok), "
            "s AS (SELECT doc_id, round(sum(ln(tf.tf / t)), 3) AS logprob "
            "FROM tok JOIN tf USING (term) CROSS JOIN tot GROUP BY doc_id) "
            "SELECT d.doc_id, coalesce(s.logprob, 0.0) AS logprob "
            "FROM documents d LEFT JOIN s USING (doc_id)"
        ),
        "text_bigram_logprob": (
            # context counts = bigram LEFT sides (tokens except each
            # doc's last); V = corpus distinct tokens; add-0.5 smoothing
            # — the identical expression the engine evaluates
            "WITH tk AS (SELECT doc_id, string_split_regex(trim(text), "
            "'\\s+') AS tl FROM documents "
            "WHERE length(trim(text)) > 0), "
            "tok AS (SELECT doc_id, unnest(tl) AS term, "
            "generate_subscripts(tl, 1) AS ord FROM tk), "
            "big AS (SELECT x.doc_id, x.term AS w1, y.term AS w2 "
            "FROM tok x JOIN tok y ON x.doc_id = y.doc_id "
            "AND y.ord = x.ord + 1), "
            "bc AS (SELECT w1, w2, CAST(count(*) AS DOUBLE) AS c "
            "FROM big GROUP BY 1, 2), "
            "ctx AS (SELECT w1, CAST(count(*) AS DOUBLE) AS c "
            "FROM big GROUP BY 1), "
            "v AS (SELECT CAST(count(DISTINCT term) AS DOUBLE) AS v "
            "FROM tok), "
            "s AS (SELECT big.doc_id, round(avg(ln((bc.c + 0.5) / "
            "(ctx.c + 0.5 * v.v))), 6) AS logprob FROM big "
            "JOIN bc USING (w1, w2) JOIN ctx USING (w1) CROSS JOIN v "
            "GROUP BY big.doc_id) "
            "SELECT d.doc_id, coalesce(s.logprob, 0.0) AS logprob "
            "FROM documents d LEFT JOIN s USING (doc_id)"
        ),
        "events_props_extract": (
            "SELECT event_type, CAST(count(j) AS BIGINT) AS n, "
            "round(avg(j), 6) AS mean_k, "
            "CAST(min(j) AS BIGINT) AS min_k, "
            "CAST(max(j) AS BIGINT) AS max_k FROM "
            "(SELECT event_type, CAST(json_extract(props, '$.k') "
            "AS BIGINT) AS j FROM events WHERE props IS NOT NULL) "
            "WHERE j IS NOT NULL AND event_type IS NOT NULL GROUP BY 1"
        ),
        "docs_ccnet_buckets": (
            # per-token mean logprob, tertile thresholds via
            # percentile_cont (same linear interpolation as the engine's
            # bucket-histogram order statistics)
            "WITH tok AS (SELECT doc_id, unnest(string_split_regex("
            "trim(text), '\\s+')) AS term FROM documents "
            "WHERE length(trim(text)) > 0), "
            "tf AS (SELECT term, count(*) AS tf FROM tok GROUP BY term), "
            "tot AS (SELECT count(*) AS t FROM tok), "
            "s AS (SELECT doc_id, round(sum(ln(tf.tf / t)) / count(*), 6) "
            "AS logprob FROM tok JOIN tf USING (term) CROSS JOIN tot "
            "GROUP BY doc_id), "
            "d AS (SELECT d.doc_id, coalesce(s.logprob, 0.0) AS logprob "
            "FROM documents d LEFT JOIN s USING (doc_id)), "
            "th AS (SELECT quantile_cont(logprob, 1.0/3) AS t1, "
            "quantile_cont(logprob, 2.0/3) AS t2 FROM d) "
            "SELECT doc_id, logprob, CASE WHEN logprob <= th.t1 THEN "
            "'tail' WHEN logprob <= th.t2 THEN 'middle' ELSE 'head' END "
            "AS bucket FROM d, th"
        ),
        "text_inverted_index": (
            "WITH tok AS (SELECT doc_id, unnest(string_split_regex("
            "trim(text), '\\s+')) AS term FROM documents "
            "WHERE length(trim(text)) > 0), "
            "tf AS (SELECT doc_id, term, count(*) AS tf FROM tok "
            "GROUP BY doc_id, term), "
            "df AS (SELECT term, count(DISTINCT doc_id) AS df FROM tok "
            "GROUP BY term) "
            "SELECT tf.term, tf.doc_id, tf.tf FROM tf "
            "JOIN df USING (term) WHERE df.df >= 10"
        ),
        "docs_chunking": (
            "WITH t AS (SELECT doc_id, string_split_regex(trim(lower(text)), "
            "'\\s+') AS tk FROM documents WHERE length(trim(text)) > 0), "
            "n AS (SELECT doc_id, tk, len(tk) AS L FROM t), "
            "c AS (SELECT doc_id, tk, L, unnest(range(0, "
            "CAST(ceil(L / 24.0) AS BIGINT))) AS ci FROM n) "
            "SELECT doc_id, ci AS chunk_idx, "
            "array_to_string(list_slice(tk, ci*24 + 1, "
            "least(ci*24 + 32, L)), ' ') AS chunk_text, "
            "least(ci*24 + 32, L) - ci*24 AS n_tokens FROM c"
        ),
        "sample_split_assign": (
            "SELECT doc_id, lang, CASE WHEN b < 900000 THEN 'train' "
            "WHEN b < 950000 THEN 'val' ELSE 'test' END AS split "
            "FROM (SELECT doc_id, lang, ('0x' || "
            "substring(md5(CAST(doc_id AS VARCHAR)), 1, 16))::UBIGINT "
            "% 1000000 AS b FROM documents)"
        ),
        "sample_fixed_k": (
            "SELECT doc_id, n_chars FROM (SELECT doc_id, n_chars "
            "FROM documents ORDER BY ('0x' || "
            "substring(md5(CAST(doc_id AS VARCHAR)), 1, 16))::UBIGINT, "
            "doc_id LIMIT 100)"
        ),
        "sample_domain_quota": _URL_CANON + (
            "SELECT doc_id, domain FROM (SELECT doc_id, domain, "
            "row_number() OVER (PARTITION BY domain ORDER BY ('0x' || "
            "substring(md5(CAST(doc_id AS VARCHAR)), 1, 16))::UBIGINT, "
            "doc_id) AS rn FROM canon) WHERE rn <= 10"
        ),
        "url_best_dedup": _sql_subst(
            _URL_CANON,
            ("'Host' || (doc_id % 23) || '.COM/p/' || doc_id || ",
             "'Host' || (doc_id % 7) || '.COM/p/' || (doc_id % 50) || "),
            ("WHEN 0 THEN '?utm_source=feed&q=1' "
             "WHEN 1 THEN '?q=1&utm_campaign=x' ",
             "WHEN 0 THEN '?utm_source=feed' "
             "WHEN 1 THEN '?utm_campaign=x' "),
        )
        + (
            "SELECT doc_id, n_chars FROM (SELECT doc_id, n_chars, "
            "row_number() OVER (PARTITION BY url_canon "
            "ORDER BY n_chars DESC, doc_id ASC) AS rn FROM canon) "
            "WHERE rn = 1"
        ),
        "docs_top_quantile": (
            "WITH c AS (SELECT n_chars, count(*) AS cnt FROM documents "
            "GROUP BY 1), "
            "s AS (SELECT n_chars, SUM(cnt) OVER (ORDER BY n_chars) AS cum "
            "FROM c), "
            "t AS (SELECT MIN(n_chars) AS thr FROM s WHERE cum >= "
            "CEIL(0.8 * (SELECT count(*) FROM documents))) "
            "SELECT d.doc_id, d.n_chars FROM documents d, t "
            "WHERE d.n_chars >= t.thr"
        ),
        "dedup_incremental": (
            "WITH new AS (SELECT doc_id, text, n_chars FROM documents "
            "WHERE doc_id % 3 = 0), "
            "old AS (SELECT text FROM documents WHERE doc_id % 2 = 0), "
            "w AS (SELECT min(doc_id) AS doc_id FROM new GROUP BY text) "
            "SELECT n.doc_id, n.n_chars FROM new n JOIN w USING (doc_id) "
            "WHERE NOT EXISTS (SELECT 1 FROM old o WHERE o.text = n.text)"
        ),
        "text_decontaminate": (
            "WITH t AS (SELECT doc_id, "
            "string_split_regex(trim(lower(text)), '\\s+') AS tk "
            "FROM documents WHERE length(trim(text)) > 0), "
            "sh AS (SELECT doc_id, CASE WHEN len(tk) >= 8 THEN "
            "[array_to_string(tk[i:i+7], ' ') for i in "
            "generate_series(1, len(tk)-7)] "
            "ELSE [array_to_string(tk, ' ')] END AS gs FROM t), "
            "e AS (SELECT DISTINCT doc_id, unnest(gs) AS g FROM sh), "
            "bg AS (SELECT DISTINCT g FROM e WHERE doc_id % 97 = 0), "
            "hits AS (SELECT e.doc_id, count(*) AS n_hits FROM e "
            "JOIN bg USING (g) GROUP BY 1) "
            "SELECT d.doc_id, CAST(COALESCE(h.n_hits, 0) AS BIGINT) AS n_hits, "
            "COALESCE(h.n_hits, 0) > 0 AS contaminated "
            "FROM documents d LEFT JOIN hits h USING (doc_id)"
        ),
        "seq_packing": (
            f"WITH t AS (SELECT doc_id, {_TOKENS} AS n_tokens FROM documents), "
            "c AS (SELECT doc_id, CAST(n_tokens AS BIGINT) AS n_tokens, "
            "COALESCE(SUM(n_tokens) OVER (ORDER BY doc_id "
            "ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS off "
            "FROM t) "
            "SELECT doc_id, n_tokens, CAST(off // 2048 AS BIGINT) AS seq_id, "
            "CAST(off % 2048 AS BIGINT) AS seq_offset FROM c"
        ),
        "text_quality": (
            f"WITH t AS (SELECT doc_id, length(text) AS n_chars, {_TOKENS} AS n_tokens, "
            "length(regexp_replace(text, '[^.,;:!?]', '', 'g')) AS n_punct "
            "FROM documents) "
            "SELECT doc_id, CAST(n_chars AS BIGINT) AS n_chars, "
            "CAST(n_tokens AS BIGINT) AS n_tokens, "
            "CASE WHEN n_tokens > 0 THEN "
            "CAST(n_chars - (n_tokens - 1) AS DOUBLE) / n_tokens ELSE 0.0 END "
            "AS mean_token_len, "
            "CASE WHEN n_chars > 0 THEN CAST(n_punct AS DOUBLE) / n_chars "
            "ELSE 0.0 END AS punct_ratio FROM t"
        ),
        "dedup_embedding": (
            # CAST to DOUBLE[] so DuckDB's kernel computes in float64 like
            # the engine (float32 accumulation would disagree near tau)
            "SELECT a.vec_id AS a, b.vec_id AS b FROM embeddings a "
            "JOIN embeddings b ON a.vec_id < b.vec_id "
            "WHERE list_cosine_similarity(CAST(a.embedding AS DOUBLE[]), "
            "CAST(b.embedding AS DOUBLE[])) >= 0.4"
        ),
        "dedup_embedding_lsh": (
            # the engine's axis-aligned banded LSH recomputed exactly:
            # 16 sign bits (bit j = embedding[j] > 0), 4 bands x 4 bits;
            # candidates share any band's bits; verify = exact float64
            # cosine >= tau inside the bucket
            "WITH bnd AS (SELECT vec_id, k.band, "
            "(CASE WHEN embedding[4*k.band+1] > 0 THEN 1 ELSE 0 END) "
            "+ 2 * (CASE WHEN embedding[4*k.band+2] > 0 THEN 1 ELSE 0 END) "
            "+ 4 * (CASE WHEN embedding[4*k.band+3] > 0 THEN 1 ELSE 0 END) "
            "+ 8 * (CASE WHEN embedding[4*k.band+4] > 0 THEN 1 ELSE 0 END) "
            "AS bits FROM embeddings "
            "CROSS JOIN (SELECT unnest([0,1,2,3]) AS band) k "
            "WHERE embedding IS NOT NULL), "
            "cand AS (SELECT DISTINCT x.vec_id AS a, y.vec_id AS b "
            "FROM bnd x JOIN bnd y ON x.band = y.band "
            "AND x.bits = y.bits AND x.vec_id < y.vec_id) "
            "SELECT c.a, c.b, "
            "round(list_cosine_similarity(CAST(ea.embedding AS DOUBLE[]), "
            "CAST(eb.embedding AS DOUBLE[])), 6) AS cos "
            "FROM cand c JOIN embeddings ea ON ea.vec_id = c.a "
            "JOIN embeddings eb ON eb.vec_id = c.b "
            "WHERE list_cosine_similarity(CAST(ea.embedding AS DOUBLE[]), "
            "CAST(eb.embedding AS DOUBLE[])) >= 0.4"
        ),
        "ann_brute_topk": (
            "WITH q AS (SELECT vec_id, embedding FROM embeddings WHERE vec_id < 10), "
            "s AS (SELECT q.vec_id AS query_id, e.vec_id AS vec_id, "
            "list_cosine_similarity(q.embedding, e.embedding) AS score "
            "FROM q CROSS JOIN embeddings e), "
            "r AS (SELECT *, row_number() OVER "
            "(PARTITION BY query_id ORDER BY score DESC, vec_id ASC) AS rank FROM s) "
            "SELECT query_id, vec_id, rank FROM r WHERE rank <= 5"
        ),
        "text_heavy_hitters": (
            # same tokenizer as token_lists: lowercase, trim, \s+ split,
            # empty docs excluded; exact top-20 (count desc, token asc)
            "WITH tok AS (SELECT unnest(string_split_regex(trim(lower(text)), "
            "'\\s+')) AS item FROM documents WHERE length(trim(text)) > 0), "
            "c AS (SELECT item, CAST(count(*) AS BIGINT) AS cnt FROM tok "
            "GROUP BY 1), "
            "r AS (SELECT *, row_number() OVER (ORDER BY cnt DESC, item ASC) "
            "AS rank FROM c) "
            "SELECT item, cnt, rank FROM r WHERE rank <= 20"
        ),
        "dedup_cross_split_leakage": (
            "WITH p AS (" + _jaccard_sql(0.3) + "), "
            "q AS (SELECT a, b, jaccard, "
            "('0x' || substring(md5(CAST(a AS VARCHAR)), 1, 16))::UBIGINT "
            "% 100 AS ba, "
            "('0x' || substring(md5(CAST(b AS VARCHAR)), 1, 16))::UBIGINT "
            "% 100 AS bb FROM p), "
            "r AS (SELECT a, b, jaccard, "
            "CASE WHEN ba < 80 THEN 'train' WHEN ba < 90 THEN 'val' "
            "ELSE 'test' END AS split_a, "
            "CASE WHEN bb < 80 THEN 'train' WHEN bb < 90 THEN 'val' "
            "ELSE 'test' END AS split_b FROM q) "
            "SELECT * FROM r WHERE split_a <> split_b"
        ),
        "docs_resumable_write": (
            # the writer's bucket assignment + row counts, recomputed via
            # the md5 bridge; a fresh gate run writes (skipped = FALSE)
            "SELECT ('0x' || substring(md5(CAST(doc_id AS VARCHAR)), 1, "
            "16))::UBIGINT % 16 AS bucket, "
            "CAST(count(*) AS BIGINT) AS \"rows\", FALSE AS skipped "
            "FROM documents GROUP BY 1"
        ),
        "docs_hash_split": (
            # same md5-u64 bridge as the SimHash oracle: bucket =
            # first-8-md5-bytes(id string) % 100; 80/10/10 bounds
            "SELECT doc_id, lang, CASE WHEN b < 80 THEN 'train' "
            "WHEN b < 90 THEN 'val' ELSE 'test' END AS split FROM ("
            "SELECT doc_id, lang, ('0x' || substring(md5(CAST(doc_id AS "
            "VARCHAR)), 1, 16))::UBIGINT % 100 AS b FROM documents)"
        ),
        "events_watermark_late": (
            # exact restatement of the allowed-lateness rule as a window
            # function over arrival (event_id) order
            # ts IS NOT NULL mirrors the operator contract: NULL
            # event-times neither advance nor get judged by the watermark
            "WITH w AS (SELECT event_id, epoch_us(ts) AS ts_us, "
            "max(epoch_us(ts)) OVER (ORDER BY event_id "
            "ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) "
            "AS prev_max FROM events WHERE ts IS NOT NULL) "
            "SELECT event_id, ts_us, prev_max - 300000000 AS watermark_us, "
            "coalesce(ts_us < prev_max - 300000000, FALSE) AS is_late "
            "FROM w"
        ),
        "windowed_agg_on_time": (
            # hourly sums over only the on-time events (same lateness rule
            # as events_watermark_late); SUM skips NULL values both sides
            "WITH w AS (SELECT event_id, event_type, value, "
            "epoch_us(ts) AS ts_us, "
            "max(epoch_us(ts)) OVER (ORDER BY event_id "
            "ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) "
            "AS prev_max FROM events WHERE ts IS NOT NULL), "
            "ot AS (SELECT * FROM w WHERE NOT "
            "coalesce(ts_us < prev_max - 300000000, FALSE)) "
            "SELECT ts_us // 3600000000 AS window, event_type, "
            "round(sum(value), 3) AS total_value, "
            "CAST(count(*) AS BIGINT) AS n FROM ot GROUP BY 1, 2"
        ),
        "multimodal_decode": (
            # the payload GENERATOR's formulas (synth_media_payloads), so
            # the engine's byte-level header parse must round-trip them
            "WITH m AS (SELECT doc_id, doc_id % 3 AS kc, doc_id // 3 AS s "
            "FROM documents) "
            "SELECT doc_id, "
            "CASE kc WHEN 0 THEN 'png' WHEN 1 THEN 'bmp' ELSE 'wav' END "
            "AS kind, "
            "CASE kc WHEN 0 THEN s % 317 + 1 WHEN 1 THEN s % 509 + 1 "
            "ELSE NULL END AS width, "
            "CASE kc WHEN 0 THEN s % 211 + 1 WHEN 1 THEN s % 255 + 1 "
            "ELSE NULL END AS height, "
            "CASE kc WHEN 0 THEN "
            "(CASE s % 4 WHEN 0 THEN 1 WHEN 1 THEN 3 WHEN 2 THEN 2 "
            "ELSE 4 END) "
            "WHEN 1 THEN (CASE WHEN s % 2 = 0 THEN 3 ELSE 4 END) "
            "ELSE s % 2 + 1 END AS channels, "
            "CASE kc WHEN 2 THEN 16 ELSE 8 END AS bit_depth, "
            "CASE kc WHEN 2 THEN (CASE s % 3 WHEN 0 THEN 8000 "
            "WHEN 1 THEN 16000 ELSE 44100 END) ELSE NULL END "
            "AS sample_rate, "
            "CASE kc WHEN 2 THEN s % 1000 + 1 ELSE NULL END AS n_samples "
            "FROM m"
        ),
        "multimodal_meta": (
            "SELECT doc_id, octet_length(encode(text)) AS n_bytes, "
            "lower(hex(encode(substring(text, 1, 4)))) AS magic FROM documents"
        ),
        "multimodal_frames": (
            # frames on the HEX image of the payload (this DuckDB has no
            # BLOB substring): byte [start, start+16) == hex chars
            # [1 + 2*start, 32]
            "SELECT d.doc_id, t.i AS frame_idx, "
            "lower(substring(hex(encode(d.text)), "
            "1 + 2 * t.i * (octet_length(encode(d.text)) // 4), 32)) "
            "AS frame_hex "
            "FROM documents d CROSS JOIN (SELECT unnest([0,1,2,3]) AS i) t"
        ),
        "embedding_gram": (
            # float64 accumulation both sides: engine partials cast the
            # float32 storage to double before X'X, SQL casts per element
            "WITH e AS (SELECT vec_id, CAST(unnest(embedding) AS DOUBLE) AS v, "
            "generate_subscripts(embedding, 1) - 1 AS i FROM embeddings) "
            "SELECT a.i AS i, b.i AS j, SUM(a.v * b.v) AS gram "
            "FROM e a JOIN e b ON a.vec_id = b.vec_id AND a.i <= b.i "
            "GROUP BY 1, 2"
        ),
        "embedding_covariance": (
            "WITH e AS (SELECT vec_id, CAST(unnest(embedding) AS DOUBLE) AS v, "
            "generate_subscripts(embedding, 1) - 1 AS i FROM embeddings), "
            "m AS (SELECT i, AVG(v) AS mu FROM e GROUP BY 1), "
            # COUNT(embedding), not COUNT(*): the engine excludes null
            # embeddings from n (unnest already drops them from the sums)
            "n AS (SELECT COUNT(embedding) AS n FROM embeddings) "
            "SELECT a.i AS i, b.i AS j, "
            "(SUM(a.v * b.v) - (SELECT n FROM n) * ma.mu * mb.mu) "
            "/ ((SELECT n FROM n) - 1) AS cov "
            "FROM e a JOIN e b ON a.vec_id = b.vec_id AND a.i <= b.i "
            "JOIN m ma ON ma.i = a.i JOIN m mb ON mb.i = b.i "
            "GROUP BY 1, 2, ma.mu, mb.mu"
        ),
        "text_bigram_topk": (
            # same tokenizer as the engine's _flat_tokens: whitespace split
            # of trimmed text, case-SENSITIVE; '' yields no tokens
            "WITH t AS (SELECT doc_id, "
            "string_split_regex(trim(text), '\\s+') AS tk "
            "FROM documents WHERE length(trim(text)) > 0), "
            "u AS (SELECT doc_id, unnest(tk) AS w, "
            "generate_subscripts(tk, 1) AS pos FROM t), "
            "b AS (SELECT a.w AS w1, c.w AS w2 FROM u a JOIN u c "
            "ON a.doc_id = c.doc_id AND c.pos = a.pos + 1), "
            "g AS (SELECT w1, w2, COUNT(*) AS cnt FROM b GROUP BY 1, 2) "
            "SELECT w1, w2, cnt FROM g ORDER BY cnt DESC, w1, w2 LIMIT 50"
        ),
        "events_rollup": (
            # GROUPING() arithmetic: lvl = grouped-column count; SUM of an
            # all-null value column is NULL in SQL but 0.0 in the engine's
            # fill_null partial — COALESCE matches (values are never all
            # null in this data; the 0.0 identity is the combiner's)
            "SELECT (2 - GROUPING(event_type) - GROUPING(week)) AS lvl, "
            "event_type, week, "
            "round(COALESCE(SUM(value), 0), 3) AS total_value, "
            "CAST(COUNT(*) AS BIGINT) AS n FROM ("
            "SELECT event_type, "
            "strftime(date_trunc('week', ts), '%Y-%m-%d') AS week, value "
            "FROM events) GROUP BY ROLLUP (event_type, week)"
        ),
        "events_cube": (
            # gid mirrors the engine: GROUPING bit of event_type is the
            # high bit, dow the low bit; dayofweek() is 0=Sunday..6 in
            # DuckDB, matched by Arrow day_of_week(week_start=7,
            # count_from_zero=True)
            "SELECT (GROUPING(event_type) * 2 + GROUPING(dow)) AS gid, "
            "event_type, dow, "
            "round(COALESCE(SUM(value), 0), 3) AS total_value, "
            "CAST(COUNT(*) AS BIGINT) AS n FROM ("
            "SELECT event_type, dayofweek(ts) AS dow, value FROM events) "
            "GROUP BY CUBE (event_type, dow)"
        ),
        "events_lag_gaps": (
            "WITH s AS (SELECT user_id, ts, "
            "LAG(ts) OVER (PARTITION BY user_id ORDER BY event_id) AS prev "
            "FROM events) "
            "SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n_gaps, "
            "CAST(SUM(date_diff('microseconds', prev, ts)) AS BIGINT) "
            "AS sum_gap_us, "
            "CAST(MAX(date_diff('microseconds', prev, ts)) AS BIGINT) "
            "AS max_gap_us "
            "FROM s WHERE prev IS NOT NULL GROUP BY 1"
        ),
        "events_peak_window": (
            "WITH w AS (SELECT user_id, avg(value) OVER ("
            "PARTITION BY user_id ORDER BY ts, event_id "
            "ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) AS mavg FROM events) "
            "SELECT user_id, round(max(mavg), 3) AS peak_avg "
            "FROM w GROUP BY user_id"
        ),
        "events_argmax_ties": (
            "SELECT user_id, event_id, value FROM events "
            "QUALIFY value = max(value) OVER (PARTITION BY user_id)"
        ),
        "spend_above_avg": (
            "WITH t AS (SELECT o_custkey, sum(o_totalprice) AS total "
            "FROM orders GROUP BY o_custkey) "
            "SELECT o_custkey, round(total, 3) AS total FROM t "
            "WHERE total > (SELECT avg(total) FROM t)"
        ),
        "text_zipf_slope": (
            "WITH tok AS (SELECT unnest(string_split_regex(trim(text), "
            "'\\s+')) AS term FROM documents WHERE length(trim(text)) > 0), "
            "tf AS (SELECT term, count(*) AS cnt FROM tok GROUP BY term), "
            "top AS (SELECT cnt, row_number() OVER (ORDER BY cnt DESC, "
            "term ASC) AS r FROM tf ORDER BY cnt DESC, term ASC LIMIT 200) "
            "SELECT CAST(count(*) AS BIGINT) AS n_terms, "
            "round(regr_slope(ln(CAST(cnt AS DOUBLE)), "
            "ln(CAST(r AS DOUBLE))), 6) AS slope FROM top"
        ),
        "text_bm25_topk": _BM25_SQL,
        "text_bm25_index_topk": _BM25_SQL,
        "dq_histogram": (
            "WITH s AS (SELECT min(value) AS mn, max(value) AS mx "
            "FROM events WHERE value IS NOT NULL), "
            "b AS (SELECT event_type, CASE WHEN s.mx = s.mn THEN 0 ELSE "
            "LEAST(CAST(FLOOR((value - s.mn) * 16.0 / (s.mx - s.mn)) "
            "AS BIGINT), 15) END AS bucket "
            "FROM events, s WHERE value IS NOT NULL) "
            "SELECT event_type, bucket, CAST(count(*) AS BIGINT) AS n "
            "FROM b GROUP BY 1, 2"
        ),
        "text_type_token_ratio": (
            "WITH tok AS (SELECT doc_id, unnest(string_split_regex("
            "trim(text), '\\s+')) AS term FROM documents "
            "WHERE length(trim(text)) > 0) "
            "SELECT doc_id, CAST(count(*) AS BIGINT) AS n_tokens, "
            "CAST(count(DISTINCT term) AS BIGINT) AS n_distinct, "
            "round(count(DISTINCT term) * 1.0 / count(*), 6) AS ttr "
            "FROM tok GROUP BY doc_id"
        ),
        "events_path_signatures": (
            "WITH r AS (SELECT user_id, event_type, row_number() OVER ("
            "PARTITION BY user_id ORDER BY event_id) AS rn FROM events), "
            "p AS (SELECT user_id, string_agg(event_type, '>' ORDER BY rn) "
            "AS path FROM r WHERE rn <= 5 GROUP BY user_id) "
            "SELECT path, CAST(count(*) AS BIGINT) AS n_keys "
            "FROM p GROUP BY path"
        ),
        "join_anti_customers": (
            "SELECT c_nationkey, CAST(COUNT(*) AS BIGINT) AS n_customers, "
            "round(SUM(c_acctbal), 3) AS acctbal_sum FROM customer c "
            "WHERE NOT EXISTS (SELECT 1 FROM orders o "
            "WHERE o.o_custkey = c.c_custkey "
            "AND o.o_orderdate >= TIMESTAMP '2001-01-01') GROUP BY 1"
        ),
        "join_full_outer_daily": (
            "WITH o AS (SELECT strftime(o_orderdate, '%Y-%m-%d') AS d, "
            "CAST(COUNT(*) AS BIGINT) AS n_orders FROM orders GROUP BY 1), "
            "e AS (SELECT strftime(ts, '%Y-%m-%d') AS d, "
            "CAST(COUNT(*) AS BIGINT) AS n_events FROM events GROUP BY 1) "
            "SELECT COALESCE(o.d, e.d) AS day, o.n_orders, e.n_events "
            "FROM o FULL OUTER JOIN e ON o.d = e.d"
        ),
        "join_semi_recent_orders": (
            "SELECT o_orderpriority, CAST(COUNT(*) AS BIGINT) AS n_orders "
            "FROM orders o WHERE EXISTS (SELECT 1 FROM lineitem l "
            "WHERE l.l_orderkey = o.o_orderkey "
            "AND l.l_shipdate >= TIMESTAMP '2001-01-01') GROUP BY 1"
        ),
        "embedding_quantize_int8": (
            # all arithmetic in DOUBLE in the engine's exact evaluation
            # order: ((v - lo) / (hi - lo)) * 255 + 0.5
            "WITH e AS (SELECT vec_id, "
            "generate_subscripts(embedding, 1) - 1 AS i, "
            "CAST(unnest(embedding) AS DOUBLE) AS v FROM embeddings), "
            "m AS (SELECT i, MIN(v) AS lo, MAX(v) AS hi FROM e GROUP BY 1) "
            "SELECT e.i AS i, round(m.lo, 6) AS lo, round(m.hi, 6) AS hi, "
            "round(AVG(LEAST(255.0, GREATEST(0.0, "
            "floor((e.v - m.lo) / (m.hi - m.lo) * 255 + 0.5)))), 6) "
            "AS avg_code "
            "FROM e JOIN m ON e.i = m.i GROUP BY e.i, m.lo, m.hi"
        ),
        "text_hashed_features": (
            # md5_u64 bridge: first 16 hex chars of md5 as UBIGINT,
            # same lowercase whitespace tokenizer as the engine
            "WITH t AS (SELECT string_split_regex(trim(lower(text)), "
            "'\\s+') AS tk FROM documents WHERE length(trim(text)) > 0), "
            "u AS (SELECT unnest(tk) AS w FROM t) "
            "SELECT CAST(CAST(('0x' || substring(md5(w), 1, 16)) AS UBIGINT)"
            " % 32 AS BIGINT) AS bucket, "
            "CAST(COUNT(*) AS BIGINT) AS n_tokens FROM u GROUP BY 1"
        ),
        "join_range_price_tier": (
            "WITH b AS (SELECT * FROM (VALUES "
            "(0, 0.0, 50000.0), (1, 50000.0, 100000.0), "
            "(2, 100000.0, 150000.0), (3, 150000.0, 200000.0), "
            "(4, 200000.0, 250000.0), (5, 250000.0, 300000.0), "
            "(6, 300000.0, 1e18)) t(tier, lo, hi)) "
            "SELECT CAST(b.tier AS BIGINT) AS tier, "
            "CAST(COUNT(*) AS BIGINT) AS n_orders, "
            "round(SUM(o_totalprice), 3) AS revenue "
            "FROM orders o JOIN b ON o.o_totalprice >= b.lo "
            "AND o.o_totalprice < b.hi GROUP BY 1"
        ),
        "sample_per_group_k": (
            # same Lehmer permutation as the engine (factors reduced mod
            # 2^31-1), rank = per-type row number by (perm, event_id)
            "WITH s AS (SELECT event_type, event_id, "
            "((event_id % 2147483647) * (2654435761 % 2147483647) + 12345) "
            "% 2147483647 AS perm FROM events), "
            "r AS (SELECT *, ROW_NUMBER() OVER (PARTITION BY event_type "
            "ORDER BY perm, event_id) AS rank FROM s) "
            "SELECT event_type, event_id, CAST(perm AS BIGINT) AS perm, "
            "CAST(rank AS BIGINT) AS rank FROM r WHERE rank <= 100"
        ),
        "events_markov_transitions": (
            "WITH s AS (SELECT user_id, event_type, "
            "LAG(event_type) OVER (PARTITION BY user_id ORDER BY event_id) "
            "AS prev_type FROM events) "
            "SELECT prev_type, event_type AS next_type, COUNT(*) AS cnt "
            "FROM s WHERE prev_type IS NOT NULL GROUP BY 1, 2"
        ),
        "events_transition_entropy": (
            "WITH s AS (SELECT user_id, event_type, "
            "LAG(event_type) OVER (PARTITION BY user_id ORDER BY event_id) "
            "AS prev_type FROM events), "
            "m AS (SELECT prev_type AS p, event_type AS n, "
            "CAST(count(*) AS DOUBLE) AS c FROM s "
            "WHERE prev_type IS NOT NULL GROUP BY 1, 2), "
            "tot AS (SELECT SUM(c) AS t FROM m), "
            "ri AS (SELECT p, SUM(c) AS ci FROM m GROUP BY 1), "
            "hc AS (SELECT -SUM(m.c / tot.t * ln(m.c / ri.ci)) AS h "
            "FROM m JOIN ri USING (p) CROSS JOIN tot), "
            "cn AS (SELECT n, SUM(c) AS cj FROM m GROUP BY 1), "
            "hn AS (SELECT -SUM(cj / tot.t * ln(cj / tot.t)) AS h "
            "FROM cn CROSS JOIN tot) "
            "SELECT round(hc.h, 6) AS h_cond, round(hn.h, 6) AS h_next, "
            "round(hn.h - hc.h, 6) AS info_gain "
            "FROM hc CROSS JOIN hn"
        ),
        "events_trigram_paths": (
            # LEAD within the user partition NULLs past each history's
            # end, so no cross-user window ever counts
            "WITH s AS (SELECT event_type AS t0, "
            "LEAD(event_type, 1) OVER "
            "(PARTITION BY user_id ORDER BY event_id) AS t1, "
            "LEAD(event_type, 2) OVER "
            "(PARTITION BY user_id ORDER BY event_id) AS t2 FROM events), "
            "c AS (SELECT t0, t1, t2, CAST(COUNT(*) AS BIGINT) AS cnt "
            "FROM s WHERE t2 IS NOT NULL GROUP BY 1, 2, 3), "
            "r AS (SELECT *, row_number() OVER "
            "(ORDER BY cnt DESC, t0 ASC, t1 ASC, t2 ASC) AS rank FROM c) "
            "SELECT t0, t1, t2, cnt, rank FROM r WHERE rank <= 20"
        ),
        "sample_weighted_topk": (
            # same Lehmer uniform + A-Res key ln(u)/w, key excluded from
            # the output (membership + tie-break by doc_id is the contract)
            "WITH s AS (SELECT doc_id, n_chars, "
            "((doc_id % 2147483647) * (2654435761 % 2147483647) + 12345) "
            "% 2147483647 AS perm FROM documents WHERE n_chars > 0) "
            # CASE guards perm = 0: the engine's key is -inf there (legal,
            # minimal priority) but DuckDB ln(0) hard-errors; NULL sorts
            # last under DESC — the same placement as -inf
            "SELECT doc_id, n_chars FROM s "
            "ORDER BY CASE WHEN perm = 0 THEN NULL "
            "ELSE ln(perm / 2147483647.0) / n_chars END DESC, doc_id "
            "LIMIT 200"
        ),
        "dq_psi_drift": (
            "WITH d AS (SELECT CAST(floor(n_chars / 64.0) AS BIGINT) AS "
            "bucket, (CAST(SUBSTR(source, 4) AS BIGINT) % 2) = 0 AS is_a "
            "FROM documents), "
            "c AS (SELECT bucket, is_a, COUNT(*) AS n FROM d GROUP BY 1, 2), "
            "shared AS (SELECT bucket FROM c GROUP BY bucket "
            "HAVING COUNT(DISTINCT is_a) = 2), "
            "tot AS (SELECT is_a, SUM(n) AS t FROM c "
            "JOIN shared USING (bucket) GROUP BY 1) "
            "SELECT a.bucket, a.n / ta.t AS p_a, b.n / tb.t AS p_b, "
            "(a.n / ta.t - b.n / tb.t) * ln((a.n / ta.t) / (b.n / tb.t)) "
            "AS psi_term "
            "FROM c a JOIN c b USING (bucket) JOIN shared USING (bucket) "
            "JOIN tot ta ON ta.is_a JOIN tot tb ON NOT tb.is_a "
            "WHERE a.is_a AND NOT b.is_a"
        ),
        "corpus_shuffle_head": (
            # same Lehmer permutation, factors reduced mod 2^31-1 FIRST on
            # both sides so the product stays inside BIGINT (a raw
            # doc_id * 2654435761 overflows DuckDB BIGINT near 3.5e9)
            "SELECT doc_id, n_chars, CAST(((doc_id % 2147483647) * "
            "(2654435761 % 2147483647) + 12345) % 2147483647 AS BIGINT) "
            "AS perm FROM documents ORDER BY perm LIMIT 100"
        ),
        "join_regional_revenue": (
            "SELECT n_name, SUM(l_extendedprice * (1 - l_discount)) "
            "AS revenue "
            "FROM customer JOIN orders ON c_custkey = o_custkey "
            "JOIN lineitem ON l_orderkey = o_orderkey "
            "JOIN supplier ON l_suppkey = s_suppkey "
            "JOIN nation ON c_nationkey = n_nationkey "
            "JOIN region ON n_regionkey = r_regionkey "
            "WHERE r_name = 'ASIA' AND c_nationkey = s_nationkey "
            "GROUP BY 1 ORDER BY revenue DESC"
        ),
        "join_top_revenue_orders": (
            "SELECT o_orderkey, o_orderdate, "
            "SUM(l_extendedprice * (1 - l_discount)) AS revenue "
            "FROM customer "
            "JOIN orders ON c_custkey = o_custkey "
            "JOIN lineitem ON l_orderkey = o_orderkey "
            "WHERE c_mktsegment = 'BUILDING' "
            "GROUP BY 1, 2 ORDER BY revenue DESC, o_orderkey LIMIT 10"
        ),
        "part_copurchase_topk": (
            "WITH d AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem), "
            "p AS (SELECT a.l_partkey AS l_partkey_a, b.l_partkey AS "
            "l_partkey_b FROM d a JOIN d b ON a.l_orderkey = b.l_orderkey "
            "AND a.l_partkey < b.l_partkey), "
            "g AS (SELECT l_partkey_a, l_partkey_b, COUNT(*) AS cnt "
            "FROM p GROUP BY 1, 2) "
            "SELECT l_partkey_a, l_partkey_b, cnt FROM g "
            "ORDER BY cnt DESC, l_partkey_a, l_partkey_b LIMIT 20"
        ),
        "events_retention_cohorts": (
            # ISO Monday weeks both sides (Arrow floor_temporal
            # week_starts_monday == DuckDB date_trunc('week'))
            "WITH uw AS (SELECT DISTINCT user_id, "
            "strftime(date_trunc('week', ts), '%Y-%m-%d') AS week FROM events), "
            "c AS (SELECT user_id, MIN(week) AS cohort_week FROM uw GROUP BY 1) "
            "SELECT c.cohort_week, uw.week, COUNT(*) AS n_users "
            "FROM uw JOIN c USING (user_id) GROUP BY 1, 2"
        ),
        "events_pivot_profile": (
            # CAST to BIGINT: DuckDB SUM yields HUGEINT -> float64 in
            # pandas, which would dtype-mismatch the engine's int64
            "SELECT user_id, "
            "CAST(COUNT(*) FILTER (event_type = 'click') AS BIGINT) AS n_click, "
            "CAST(COUNT(*) FILTER (event_type = 'error') AS BIGINT) AS n_error, "
            "CAST(COUNT(*) FILTER (event_type = 'purchase') AS BIGINT) AS n_purchase, "
            "CAST(COUNT(*) FILTER (event_type = 'signup') AS BIGINT) AS n_signup, "
            "CAST(COUNT(*) FILTER (event_type = 'view') AS BIGINT) AS n_view "
            "FROM events GROUP BY 1"
        ),
        "events_type_entropy": (
            # H = ln n - sum(c ln c)/n over the per-(user,type) counts —
            # the same closed form as the engine's moment finish
            "WITH c AS (SELECT user_id, event_type, COUNT(*) AS cnt "
            "FROM events GROUP BY 1, 2) "
            "SELECT user_id, CAST(SUM(cnt) AS BIGINT) AS n_events, "
            "CAST(COUNT(*) AS BIGINT) AS n_types, "
            "ln(SUM(cnt)) - SUM(cnt * ln(cnt)) / SUM(cnt) AS entropy "
            "FROM c GROUP BY 1"
        ),
        "stats_regression_tax": (
            "SELECT l_returnflag, CAST(COUNT(*) AS BIGINT) AS n, "
            "regr_slope(l_tax, l_discount) AS slope, "
            "regr_intercept(l_tax, l_discount) AS intercept, "
            "corr(l_tax, l_discount) AS corr "
            "FROM lineitem GROUP BY 1"
        ),
        "dq_benford": (
            # generate_series LEFT JOIN keeps all nine digits even when a
            # digit is absent (the engine's bincount always emits nine)
            "WITH d AS (SELECT CAST(floor(o_totalprice / "
            "power(10, floor(log10(o_totalprice)))) AS BIGINT) AS digit "
            "FROM orders WHERE o_totalprice > 0), "
            "c AS (SELECT digit, COUNT(*) AS cnt FROM d GROUP BY 1), "
            "g AS (SELECT generate_series AS digit "
            "FROM generate_series(1, 9)), "
            "m AS (SELECT g.digit, CAST(COALESCE(c.cnt, 0) AS BIGINT) "
            "AS cnt FROM g LEFT JOIN c USING (digit)), "
            "t AS (SELECT CAST(SUM(cnt) AS DOUBLE) AS tot FROM m) "
            "SELECT m.digit, m.cnt, m.cnt / t.tot AS share, "
            "log10(1 + 1.0 / m.digit) AS expected, "
            "m.cnt / t.tot - log10(1 + 1.0 / m.digit) AS deviation "
            "FROM m, t"
        ),
        "stats_group_means": (
            "SELECT l_returnflag, CAST(COUNT(*) AS BIGINT) AS n, "
            "SUM(l_quantity) / COUNT(*) AS mean_arith, "
            "exp(SUM(ln(l_quantity)) / COUNT(*)) AS mean_geom, "
            "COUNT(*) / SUM(1.0 / l_quantity) AS mean_harm "
            "FROM lineitem WHERE l_quantity > 0 GROUP BY 1"
        ),
        "events_first_touch": (
            "SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n_events, "
            "arg_min(event_type, event_id) AS first_type, "
            "arg_max(event_type, event_id) AS last_type "
            "FROM events GROUP BY 1"
        ),
        "events_ewma": (
            # adjust=True EWMA == weights (1-a)^(rank from the END) —
            # bounded weights, no (1-a)^(-i) overflow for long streams
            "WITH r AS (SELECT user_id, value, "
            "ROW_NUMBER() OVER (PARTITION BY user_id "
            "ORDER BY event_id DESC) - 1 AS k "
            "FROM events WHERE value IS NOT NULL) "
            "SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n_events, "
            "SUM(value * pow(0.8, k)) / SUM(pow(0.8, k)) AS ewma "
            "FROM r GROUP BY 1"
        ),
        "stats_percent_rank": (
            # the engine ranks non-NULL values only (NULL rows dropped,
            # denominator = non-NULL count - 1); make that explicit here
            # rather than relying on the column being NULL-free
            "SELECT o_orderkey, o_totalprice, "
            "PERCENT_RANK() OVER (ORDER BY o_totalprice) AS pr "
            "FROM orders WHERE o_totalprice IS NOT NULL"
        ),
        "stats_dense_rank": (
            "SELECT o_orderkey, o_totalprice, "
            "CAST(dense_rank() OVER (ORDER BY o_totalprice) AS BIGINT) "
            "AS dr FROM orders WHERE o_totalprice IS NOT NULL"
        ),
        "dq_outliers_mad": (
            # DuckDB median(DOUBLE) is interpolated == numpy linear
            "WITH m AS (SELECT event_type, median(value) AS med "
            "FROM events WHERE value IS NOT NULL GROUP BY 1), "
            "d AS (SELECT e.event_type, abs(e.value - m.med) AS dev "
            "FROM events e JOIN m USING (event_type) "
            "WHERE e.value IS NOT NULL), "
            "s AS (SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n, "
            "median(dev) AS mad FROM d GROUP BY 1) "
            "SELECT s.event_type, s.n, m.med AS median, s.mad AS mad, "
            "CAST(COUNT(*) FILTER (d.dev > 3.0 * 1.4826 * s.mad) "
            "AS BIGINT) AS n_outliers, "
            "COUNT(*) FILTER (d.dev > 3.0 * 1.4826 * s.mad) / "
            "CAST(s.n AS DOUBLE) AS outlier_rate "
            "FROM d JOIN s USING (event_type) JOIN m USING (event_type) "
            "GROUP BY 1, 2, 3, 4"
        ),
        "graph_pagerank": (
            # five unrolled power iterations on the symmetrized
            # part<->supplier graph; every node has out-degree >= 1 so
            # there is no dangling mass
            "WITH e AS ("
            "SELECT DISTINCT l_partkey * 2 AS src, "
            "l_suppkey * 2 + 1 AS dst FROM lineitem "
            "UNION "
            "SELECT DISTINCT l_suppkey * 2 + 1 AS src, "
            "l_partkey * 2 AS dst FROM lineitem), "
            "deg AS (SELECT src, CAST(COUNT(*) AS DOUBLE) AS d "
            "FROM e GROUP BY 1), "
            "nn AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n FROM deg), "
            "r0 AS (SELECT src AS node, 1.0 / nn.n AS r FROM deg, nn), "
            "r1 AS (SELECT e.dst AS node, 0.15 / (SELECT n FROM nn) + "
            "0.85 * SUM(p.r / deg.d) AS r FROM e "
            "JOIN r0 p ON e.src = p.node JOIN deg ON e.src = deg.src "
            "GROUP BY 1), "
            "r2 AS (SELECT e.dst AS node, 0.15 / (SELECT n FROM nn) + "
            "0.85 * SUM(p.r / deg.d) AS r FROM e "
            "JOIN r1 p ON e.src = p.node JOIN deg ON e.src = deg.src "
            "GROUP BY 1), "
            "r3 AS (SELECT e.dst AS node, 0.15 / (SELECT n FROM nn) + "
            "0.85 * SUM(p.r / deg.d) AS r FROM e "
            "JOIN r2 p ON e.src = p.node JOIN deg ON e.src = deg.src "
            "GROUP BY 1), "
            "r4 AS (SELECT e.dst AS node, 0.15 / (SELECT n FROM nn) + "
            "0.85 * SUM(p.r / deg.d) AS r FROM e "
            "JOIN r3 p ON e.src = p.node JOIN deg ON e.src = deg.src "
            "GROUP BY 1), "
            "r5 AS (SELECT e.dst AS node, 0.15 / (SELECT n FROM nn) + "
            "0.85 * SUM(p.r / deg.d) AS r FROM e "
            "JOIN r4 p ON e.src = p.node JOIN deg ON e.src = deg.src "
            "GROUP BY 1) "
            "SELECT node, r AS rank, r * (SELECT n FROM nn) "
            "AS rank_scaled FROM r5"
        ),
        "graph_triangles": (
            # top-2000 co-purchase subgraph (ties broken cnt desc, a, b —
            # mirrors the engine's top-k cut), triangles counted once at
            # each triangle's lexicographically lowest vertex
            "WITH li AS (SELECT DISTINCT l_orderkey AS g, "
            "l_partkey AS item FROM lineitem), "
            "p AS (SELECT x.item AS a, y.item AS b, "
            "CAST(count(*) AS BIGINT) AS cnt FROM li x "
            "JOIN li y ON x.g = y.g AND x.item < y.item GROUP BY 1, 2), "
            "e AS (SELECT a, b FROM p "
            "ORDER BY cnt DESC, a ASC, b ASC LIMIT 2000), "
            "nodes AS (SELECT a AS v FROM e UNION SELECT b FROM e), "
            "w AS (SELECT e1.b AS x, e2.b AS y FROM e e1 "
            "JOIN e e2 ON e1.a = e2.a AND e1.b < e2.b), "
            "t AS (SELECT CAST(count(*) AS BIGINT) AS n_triangles "
            "FROM w JOIN e ON w.x = e.a AND w.y = e.b), "
            "deg AS (SELECT node, CAST(count(*) AS BIGINT) AS d FROM "
            "(SELECT a AS node FROM e UNION ALL SELECT b FROM e) "
            "GROUP BY 1), "
            "wd AS (SELECT CAST(sum(d * (d - 1) // 2) AS BIGINT) "
            "AS n_wedges FROM deg) "
            "SELECT (SELECT CAST(count(*) AS BIGINT) FROM nodes) "
            "AS n_nodes, "
            "(SELECT CAST(count(*) AS BIGINT) FROM e) AS n_edges, "
            "t.n_triangles, wd.n_wedges, "
            "3.0 * t.n_triangles / wd.n_wedges AS clustering_coef "
            "FROM t, wd"
        ),
        "graph_local_clustering": (
            # same top-2000 co-purchase edge cut; triangles enumerated
            # once as a < b < c paths with the closing (a, c) edge, then
            # exploded to all three corners; degree-2+ nodes only; ORDER
            # BY the ROUNDED lcc (the engine rounds before its top-k)
            "WITH li AS (SELECT DISTINCT l_orderkey AS g, "
            "l_partkey AS item FROM lineitem), "
            "p AS (SELECT x.item AS a, y.item AS b, "
            "CAST(count(*) AS BIGINT) AS cnt FROM li x "
            "JOIN li y ON x.g = y.g AND x.item < y.item GROUP BY 1, 2), "
            "e AS (SELECT a, b FROM p "
            "ORDER BY cnt DESC, a ASC, b ASC LIMIT 2000), "
            "tri3 AS (SELECT e1.a AS u, e1.b AS v, e2.b AS w "
            "FROM e e1 JOIN e e2 ON e2.a = e1.b "
            "JOIN e e3 ON e3.a = e1.a AND e3.b = e2.b), "
            "corners AS (SELECT u AS node FROM tri3 "
            "UNION ALL SELECT v FROM tri3 UNION ALL SELECT w FROM tri3), "
            "tn AS (SELECT node, CAST(count(*) AS BIGINT) AS tri "
            "FROM corners GROUP BY 1), "
            "deg AS (SELECT node, CAST(count(*) AS BIGINT) AS deg FROM "
            "(SELECT a AS node FROM e UNION ALL SELECT b FROM e) "
            "GROUP BY 1) "
            "SELECT deg.node, deg.deg, "
            "coalesce(tn.tri, 0) AS tri, "
            "round(2.0 * coalesce(tn.tri, 0) "
            "/ (deg.deg * (deg.deg - 1.0)), 6) AS lcc "
            "FROM deg LEFT JOIN tn USING (node) WHERE deg.deg >= 2 "
            "ORDER BY lcc DESC, deg.node ASC LIMIT 50"
        ),
        "graph_adamic_adar": (
            # same top-2000 co-purchase edge cut; AA over FULL
            # neighborhoods (deg = full degree in the cut graph);
            # non-adjacent pairs only; ORDER BY the ROUNDED score (the
            # engine rounds before its top-k)
            "WITH li AS (SELECT DISTINCT l_orderkey AS g, "
            "l_partkey AS item FROM lineitem), "
            "p AS (SELECT x.item AS a, y.item AS b, "
            "CAST(count(*) AS BIGINT) AS cnt FROM li x "
            "JOIN li y ON x.g = y.g AND x.item < y.item GROUP BY 1, 2), "
            "e AS (SELECT a, b FROM p "
            "ORDER BY cnt DESC, a ASC, b ASC LIMIT 2000), "
            "und AS (SELECT a AS c, b AS n FROM e "
            "UNION ALL SELECT b, a FROM e), "
            "deg AS (SELECT c, CAST(count(*) AS BIGINT) AS d "
            "FROM und GROUP BY 1), "
            "w AS (SELECT u1.n AS x, u2.n AS y, u1.c AS c FROM und u1 "
            "JOIN und u2 ON u1.c = u2.c AND u1.n < u2.n), "
            "aa AS (SELECT w.x, w.y, round(sum(1.0 / ln(deg.d)), 6) "
            "AS aa_score FROM w JOIN deg ON deg.c = w.c GROUP BY 1, 2), "
            "ne AS (SELECT aa.* FROM aa LEFT JOIN e "
            "ON e.a = aa.x AND e.b = aa.y WHERE e.a IS NULL) "
            "SELECT x AS node_a, y AS node_b, aa_score FROM ne "
            "ORDER BY aa_score DESC, node_a ASC, node_b ASC LIMIT 50"
        ),
        "graph_kcore": _kcore_sql(k=3, rounds=4),
        "graph_label_prop": _lpa_sql(rounds=3),
        "events_markov_stationary": _markov_stationary_sql(rounds=8),
        "graph_rich_club": (
            # same top-2000 edge cut; rich nodes = degree > 10; phi =
            # edges among rich / C(n_rich, 2)
            "WITH li AS MATERIALIZED (SELECT DISTINCT l_orderkey AS g, "
            "l_partkey AS item FROM lineitem), "
            "p AS MATERIALIZED (SELECT x.item AS a, y.item AS b, "
            "CAST(count(*) AS BIGINT) AS cnt FROM li x "
            "JOIN li y ON x.g = y.g AND x.item < y.item GROUP BY 1, 2), "
            "e AS MATERIALIZED (SELECT a, b FROM p "
            "ORDER BY cnt DESC, a ASC, b ASC LIMIT 2000), "
            "deg AS MATERIALIZED (SELECT node, "
            "CAST(count(*) AS BIGINT) AS d FROM "
            "(SELECT a AS node FROM e UNION ALL SELECT b FROM e) "
            "GROUP BY 1), "
            "rich AS MATERIALIZED (SELECT node FROM deg WHERE d > 10), "
            "c AS (SELECT CAST(count(*) AS BIGINT) AS n_rich FROM rich), "
            "er AS (SELECT CAST(count(*) AS BIGINT) AS e_rich FROM e "
            "JOIN rich x ON e.a = x.node JOIN rich y ON e.b = y.node) "
            "SELECT CAST(10 AS BIGINT) AS k, c.n_rich, er.e_rich, "
            "CASE WHEN c.n_rich >= 2 THEN round(er.e_rich * 1.0 / "
            "(c.n_rich * (c.n_rich - 1) // 2), 6) ELSE NULL END AS phi "
            "FROM c, er"
        ),
        "part_brand_hhi": (
            "WITH r AS (SELECT p.p_type, p.p_brand, "
            "sum(l.l_extendedprice) AS rev FROM lineitem l "
            "JOIN part p ON p.p_partkey = l.l_partkey GROUP BY 1, 2), "
            "t AS (SELECT p_type, sum(rev) AS tot FROM r GROUP BY 1) "
            "SELECT r.p_type, CAST(count(*) AS BIGINT) AS n_brands, "
            "round(sum((r.rev / t.tot) * (r.rev / t.tot)), 6) AS hhi "
            "FROM r JOIN t USING (p_type) GROUP BY 1"
        ),
        "text_source_vocab_overlap": (
            # same whitespace tokenizer; jaccard = inter / (va + vb -
            # inter) over exact distinct-token counts; ORDER BY the
            # ROUNDED jaccard (the engine rounds before its top-k)
            "WITH tok AS (SELECT DISTINCT source, "
            "unnest(string_split_regex(trim(text), '\\s+')) AS w "
            "FROM documents WHERE length(trim(text)) > 0), "
            "v AS (SELECT source, CAST(count(*) AS BIGINT) AS nv "
            "FROM tok GROUP BY 1), "
            "i AS (SELECT a.source AS sa, b.source AS sb, "
            "CAST(count(*) AS BIGINT) AS n_shared FROM tok a "
            "JOIN tok b ON a.w = b.w AND a.source < b.source "
            "GROUP BY 1, 2) "
            "SELECT sa AS source_a, sb AS source_b, n_shared, "
            "round(n_shared * 1.0 / (va.nv + vb.nv - n_shared), 6) "
            "AS jaccard FROM i "
            "JOIN v va ON va.source = sa JOIN v vb ON vb.source = sb "
            "ORDER BY jaccard DESC, source_a ASC, source_b ASC LIMIT 50"
        ),
        "docs_length_lognormal": (
            # population sigma in the same conditioned raw-sum form
            "WITH d AS (SELECT source, ln(CAST(n_chars AS DOUBLE)) AS x "
            "FROM documents WHERE n_chars > 0), "
            "s AS (SELECT source, CAST(count(*) AS BIGINT) AS n, "
            "sum(x) AS sx, sum(x * x) AS sxx FROM d GROUP BY 1) "
            "SELECT source, n, round(sx / n, 6) AS mu, "
            "round(sqrt(greatest(sxx / n - (sx / n) * (sx / n), 0.0)), 6) "
            "AS sigma, round(exp(sx / n), 6) AS fit_median "
            "FROM s ORDER BY source"
        ),
        "events_dow_seasonality": (
            "WITH d AS (SELECT CAST(ts AS DATE) AS day, sum(value) AS v "
            "FROM events WHERE value IS NOT NULL AND NOT isnan(value) "
            "AND ts IS NOT NULL GROUP BY 1), "
            "o AS (SELECT avg(v) AS ov FROM d) "
            "SELECT CAST(isodow(day) AS BIGINT) AS dow, "
            "CAST(count(*) AS BIGINT) AS n_days, "
            "round(avg(v), 6) AS mean_total, "
            "round(avg(v) / any_value(o.ov), 6) AS seasonality_index "
            "FROM d, o GROUP BY 1 ORDER BY 1"
        ),
        "orders_ship_lag_quantiles": (
            "WITH fs AS (SELECT l_orderkey, min(l_shipdate) AS f "
            "FROM lineitem GROUP BY 1), "
            "l AS (SELECT o.o_orderpriority, "
            "(epoch_us(fs.f) - epoch_us(o.o_orderdate)) / 86400000000.0 "
            "AS lag FROM fs JOIN orders o "
            "ON o.o_orderkey = fs.l_orderkey), "
            "a AS (SELECT o_orderpriority, "
            "quantile_cont(lag, [0.5, 0.9, 0.99]) AS vs FROM l "
            "GROUP BY 1) "
            "SELECT o_orderpriority, unnest([0.5, 0.9, 0.99]) AS q, "
            "round(unnest(vs), 6) AS value FROM a"
        ),
        "text_heaps_law": (
            # same whitespace tokenizer as text_token_count; Heaps fit =
            # regr_slope/intercept over (ln N, ln V) across sources
            "WITH tok AS (SELECT source, "
            "unnest(string_split_regex(trim(text), '\\s+')) AS w "
            "FROM documents WHERE length(trim(text)) > 0), "
            "s AS (SELECT source, CAST(count(*) AS BIGINT) AS n_tokens, "
            "CAST(count(DISTINCT w) AS BIGINT) AS n_vocab "
            "FROM tok GROUP BY 1), "
            "fit AS (SELECT regr_slope(ln(n_vocab), ln(n_tokens)) AS beta, "
            "regr_intercept(ln(n_vocab), ln(n_tokens)) AS a FROM s) "
            "SELECT s.source, s.n_tokens, s.n_vocab, "
            "round(fit.beta, 6) AS heaps_beta, "
            "round(exp(fit.a), 6) AS heaps_k FROM s, fit"
        ),
        "cdc_incremental_distinct": _LWW
        + (
            "SELECT event_type, "
            "CAST(count(DISTINCT props) AS BIGINT) AS n_distinct "
            "FROM ranked WHERE rn = 1 AND op <> 'd' GROUP BY 1"
        ),
        "stats_brown_forsythe": (
            # ANOVA on |value - round(group median, 6)|; same mean-square
            # conditioning as stats_anova_f
            "WITH m AS (SELECT event_type AS g, "
            "round(percentile_cont(0.5) WITHIN GROUP (ORDER BY value), 6) "
            "AS med FROM events WHERE event_type IS NOT NULL "
            "AND value IS NOT NULL GROUP BY 1), "
            "d AS (SELECT e.event_type AS g, abs(e.value - m.med) AS v "
            "FROM events e JOIN m ON e.event_type = m.g "
            "WHERE e.value IS NOT NULL), "
            "s AS (SELECT g, CAST(count(v) AS BIGINT) AS n, sum(v) AS s, "
            "sum(v * v) AS ss FROM d GROUP BY 1), "
            "t AS (SELECT CAST(count(*) AS BIGINT) AS k, "
            "CAST(sum(n) AS BIGINT) AS n, sum(s) / sum(n) AS grand "
            "FROM s), "
            "p AS (SELECT sum(s.n * pow(s.s / s.n - t.grand, 2)) "
            "/ (t.k - 1) AS msb, "
            "sum(s.ss - s.n * pow(s.s / s.n, 2)) / (t.n - t.k) AS msw "
            "FROM s, t GROUP BY t.k, t.n) "
            "SELECT t.k, t.n, round(p.msb / p.msw, 6) AS f_stat, "
            "round(p.msb, 6) AS ms_between, round(p.msw, 6) AS ms_within "
            "FROM t, p"
        ),
        "events_seasonal_backtest": (
            "WITH d AS (SELECT CAST(ts AS DATE) AS day, sum(value) AS v "
            "FROM events WHERE value IS NOT NULL AND NOT isnan(value) "
            "AND ts IS NOT NULL GROUP BY 1), "
            "l AS (SELECT v, lag(v, 7) OVER (ORDER BY day) AS p FROM d), "
            "s AS (SELECT v - p AS e, v, p FROM l WHERE p IS NOT NULL) "
            "SELECT CAST(count(*) AS BIGINT) AS n_scored, "
            "round(avg(abs(e)), 6) AS mae, "
            "round(sqrt(avg(e * e)), 6) AS rmse, "
            "round(avg(2 * abs(e) / (abs(v) + abs(p))), 6) AS smape FROM s"
        ),
        "part_abc_classes": (
            "WITH r AS (SELECT l_partkey, sum(l_extendedprice) AS rev "
            "FROM lineitem GROUP BY 1), "
            "o AS (SELECT *, sum(rev) OVER (ORDER BY rev DESC, l_partkey "
            "ROWS UNBOUNDED PRECEDING) AS cum, "
            "sum(rev) OVER () AS tot FROM r), "
            "c AS (SELECT CASE WHEN cum <= 0.8 * tot THEN 'A' "
            "WHEN cum <= 0.95 * tot THEN 'B' ELSE 'C' END AS abc_class, "
            "rev, tot FROM o) "
            "SELECT abc_class, CAST(count(*) AS BIGINT) AS n_keys, "
            "round(sum(rev) / any_value(tot), 6) AS revenue_share "
            "FROM c GROUP BY 1 ORDER BY 1"
        ),
        "stats_hill_tail": (
            "WITH c AS (SELECT user_id, count(*) AS n FROM events "
            "WHERE user_id IS NOT NULL GROUP BY 1), "
            "t AS (SELECT CAST(count(*) AS BIGINT) AS k, "
            "sum(ln(n / 20.0)) AS s FROM c WHERE n >= 20) "
            "SELECT k AS n_tail, round(1.0 + k / s, 6) AS alpha "
            "FROM t WHERE k > 0"
        ),
        "stats_runs_test": (
            "WITH d AS (SELECT CAST(ts AS DATE) AS day, sum(value) AS v "
            "FROM events WHERE value IS NOT NULL AND NOT isnan(value) "
            "AND ts IS NOT NULL GROUP BY 1), "
            "l AS (SELECT day, v - lag(v) OVER (ORDER BY day) AS df "
            "FROM d), "
            "s AS (SELECT day, CASE WHEN df > 0 THEN 1 ELSE -1 END AS sg "
            "FROM l WHERE df IS NOT NULL AND df <> 0), "
            "r AS (SELECT sg, lag(sg) OVER (ORDER BY day) AS prev FROM s), "
            "c AS (SELECT CAST(sum(CASE WHEN sg > 0 THEN 1 ELSE 0 END) "
            "AS BIGINT) AS n_pos, "
            "CAST(sum(CASE WHEN sg < 0 THEN 1 ELSE 0 END) AS BIGINT) "
            "AS n_neg, "
            "CAST(sum(CASE WHEN prev IS NULL OR sg <> prev THEN 1 "
            "ELSE 0 END) AS BIGINT) AS n_runs FROM r), "
            "m AS (SELECT *, 2.0 * n_pos * n_neg / (n_pos + n_neg) + 1.0 "
            "AS mu FROM c) "
            "SELECT n_pos, n_neg, n_runs, "
            "round((n_runs - mu) / sqrt((mu - 1.0) * (mu - 2.0) "
            "/ (n_pos + n_neg - 1.0)), 6) AS z FROM m"
        ),
        "events_rolling_median": (
            "WITH b AS (SELECT date_trunc('day', ts) AS d, value AS v "
            "FROM events WHERE value IS NOT NULL AND NOT isnan(value) "
            "AND ts IS NOT NULL), "
            "days AS (SELECT DISTINCT d FROM b), "
            "w AS (SELECT days.d AS wd, b.v FROM days JOIN b "
            "ON b.d >= days.d - INTERVAL 6 DAY AND b.d <= days.d) "
            "SELECT strftime(wd, '%Y-%m-%d') AS day, "
            "CAST(count(*) AS BIGINT) AS n_win, "
            "round(percentile_cont(0.5) WITHIN GROUP (ORDER BY v), 6) "
            "AS med_7d FROM w GROUP BY 1"
        ),
        "orders_late_ship": (
            # Q4 shape: EXISTS lineitem shipped > 60 days after the order
            "SELECT o.o_orderpriority, "
            "CAST(count(*) AS BIGINT) AS n_late_orders FROM orders o "
            "WHERE EXISTS (SELECT 1 FROM lineitem l "
            "WHERE l.l_orderkey = o.o_orderkey "
            "AND l.l_shipdate > o.o_orderdate + INTERVAL 60 DAY) "
            "GROUP BY 1"
        ),
        "graph_assortativity": (
            # same top-2000 edge cut as graph_triangles; assortativity =
            # corr(deg(u), deg(v)) over both orientations of every edge
            "WITH li AS (SELECT DISTINCT l_orderkey AS g, "
            "l_partkey AS item FROM lineitem), "
            "p AS (SELECT x.item AS a, y.item AS b, "
            "CAST(count(*) AS BIGINT) AS cnt FROM li x "
            "JOIN li y ON x.g = y.g AND x.item < y.item GROUP BY 1, 2), "
            "e AS (SELECT a, b FROM p "
            "ORDER BY cnt DESC, a ASC, b ASC LIMIT 2000), "
            "und AS (SELECT a AS u, b AS v FROM e "
            "UNION ALL SELECT b, a FROM e), "
            "deg AS (SELECT u AS node, CAST(count(*) AS BIGINT) AS d "
            "FROM und GROUP BY 1), "
            "pts AS (SELECT du.d AS x, dv.d AS y FROM und "
            "JOIN deg du ON und.u = du.node "
            "JOIN deg dv ON und.v = dv.node) "
            "SELECT round(corr(x, y), 6) AS assortativity, "
            "(SELECT CAST(count(*) AS BIGINT) FROM deg) AS n_nodes, "
            "CAST(count(*) AS BIGINT) AS m2 FROM pts"
        ),
        "graph_bfs_hops": (
            # same top-2000 edge cut as graph_triangles; BFS unrolled to
            # 3 levels, seeds = 5 lowest node ids
            "WITH li AS (SELECT DISTINCT l_orderkey AS g, "
            "l_partkey AS item FROM lineitem), "
            "p AS (SELECT x.item AS a, y.item AS b, "
            "CAST(count(*) AS BIGINT) AS cnt FROM li x "
            "JOIN li y ON x.g = y.g AND x.item < y.item GROUP BY 1, 2), "
            "e AS (SELECT a, b FROM p "
            "ORDER BY cnt DESC, a ASC, b ASC LIMIT 2000), "
            "und AS (SELECT a AS u, b AS v FROM e "
            "UNION SELECT b AS u, a AS v FROM e), "
            "l0 AS (SELECT DISTINCT u AS node FROM und "
            "ORDER BY u LIMIT 5), "
            "l1 AS (SELECT DISTINCT v AS node FROM und "
            "JOIN l0 ON und.u = l0.node "
            "WHERE v NOT IN (SELECT node FROM l0)), "
            "l2 AS (SELECT DISTINCT v AS node FROM und "
            "JOIN l1 ON und.u = l1.node "
            "WHERE v NOT IN (SELECT node FROM l0) "
            "AND v NOT IN (SELECT node FROM l1)), "
            "l3 AS (SELECT DISTINCT v AS node FROM und "
            "JOIN l2 ON und.u = l2.node "
            "WHERE v NOT IN (SELECT node FROM l0) "
            "AND v NOT IN (SELECT node FROM l1) "
            "AND v NOT IN (SELECT node FROM l2)) "
            "SELECT node, CAST(0 AS BIGINT) AS hops FROM l0 "
            "UNION ALL SELECT node, CAST(1 AS BIGINT) FROM l1 "
            "UNION ALL SELECT node, CAST(2 AS BIGINT) FROM l2 "
            "UNION ALL SELECT node, CAST(3 AS BIGINT) FROM l3"
        ),
        "graph_connected_components": (
            # same top-2000 edge cut as graph_triangles; component id =
            # min node id, computed via the all-reachable-pairs
            # recursive CTE (fine at oracle scale)
            "WITH RECURSIVE li AS (SELECT DISTINCT l_orderkey AS g, "
            "l_partkey AS item FROM lineitem), "
            "p AS (SELECT x.item AS a, y.item AS b, "
            "CAST(count(*) AS BIGINT) AS cnt FROM li x "
            "JOIN li y ON x.g = y.g AND x.item < y.item GROUP BY 1, 2), "
            "e AS (SELECT a, b FROM p "
            "ORDER BY cnt DESC, a ASC, b ASC LIMIT 2000), "
            "und AS (SELECT a AS u, b AS v FROM e "
            "UNION SELECT b, a FROM e), "
            "reach(a, b) AS (SELECT u, v FROM und "
            "UNION SELECT r.a, und.v FROM reach r "
            "JOIN und ON r.b = und.u), "
            "comp AS (SELECT a AS node, least(a, min(b)) AS comp "
            "FROM reach GROUP BY a) "
            "SELECT comp, CAST(count(*) AS BIGINT) AS n_nodes "
            "FROM comp GROUP BY comp"
        ),
        "dq_corr_matrix": (
            "SELECT * FROM ("
            "SELECT 'l_quantity' AS col_a, 'l_extendedprice' AS col_b, "
            "CAST(count(*) FILTER (l_quantity IS NOT NULL AND l_extendedprice IS NOT NULL) AS BIGINT) AS n, "
            "corr(l_quantity, l_extendedprice) AS corr FROM lineitem "
            "UNION ALL SELECT 'l_quantity', 'l_discount', "
            "CAST(count(*) FILTER (l_quantity IS NOT NULL AND l_discount IS NOT NULL) AS BIGINT), corr(l_quantity, l_discount) "
            "FROM lineitem "
            "UNION ALL SELECT 'l_quantity', 'l_tax', "
            "CAST(count(*) FILTER (l_quantity IS NOT NULL AND l_tax IS NOT NULL) AS BIGINT), corr(l_quantity, l_tax) "
            "FROM lineitem "
            "UNION ALL SELECT 'l_extendedprice', 'l_discount', "
            "CAST(count(*) FILTER (l_extendedprice IS NOT NULL AND l_discount IS NOT NULL) AS BIGINT), corr(l_extendedprice, l_discount) "
            "FROM lineitem "
            "UNION ALL SELECT 'l_extendedprice', 'l_tax', "
            "CAST(count(*) FILTER (l_extendedprice IS NOT NULL AND l_tax IS NOT NULL) AS BIGINT), corr(l_extendedprice, l_tax) "
            "FROM lineitem "
            "UNION ALL SELECT 'l_discount', 'l_tax', "
            "CAST(count(*) FILTER (l_discount IS NOT NULL AND l_tax IS NOT NULL) AS BIGINT), corr(l_discount, l_tax) "
            "FROM lineitem)"
        ),
        "events_group_percent_rank": (
            "SELECT event_id, event_type, value, "
            "PERCENT_RANK() OVER (PARTITION BY event_type "
            "ORDER BY value) AS pr "
            "FROM events WHERE value IS NOT NULL"
        ),
        "events_longest_streak": (
            # gaps-and-islands: day - ROW_NUMBER() is constant within a
            # run of consecutive days
            "WITH d AS (SELECT DISTINCT user_id, CAST(ts AS DATE) AS day "
            "FROM events), "
            "r AS (SELECT user_id, day, ROW_NUMBER() OVER ("
            "PARTITION BY user_id ORDER BY day) AS rn FROM d), "
            "g AS (SELECT user_id, day - CAST(rn AS INTEGER) AS anchor "
            "FROM r), "
            "s AS (SELECT user_id, anchor, CAST(count(*) AS BIGINT) "
            "AS len FROM g GROUP BY 1, 2) "
            "SELECT user_id, CAST(sum(len) AS BIGINT) AS n_days, "
            "CAST(max(len) AS BIGINT) AS longest_streak "
            "FROM s GROUP BY 1"
        ),
        "events_type_overlap": (
            "WITH d AS (SELECT DISTINCT user_id, event_type FROM events), "
            "c AS (SELECT event_type, CAST(count(*) AS BIGINT) AS n "
            "FROM d GROUP BY 1), "
            "p AS (SELECT a.event_type AS type_a, b.event_type AS type_b, "
            "CAST(count(*) AS BIGINT) AS n_both FROM d a "
            "JOIN d b ON a.user_id = b.user_id "
            "AND a.event_type < b.event_type GROUP BY 1, 2) "
            "SELECT p.type_a, p.type_b, p.n_both, ca.n AS n_a, "
            "cb.n AS n_b, CAST(p.n_both AS DOUBLE) / "
            "(ca.n + cb.n - p.n_both) AS jaccard "
            "FROM p JOIN c ca ON p.type_a = ca.event_type "
            "JOIN c cb ON p.type_b = cb.event_type"
        ),
        "orders_churned_customers": (
            # integer-day midpoint: min + (max - min) // 2, matching the
            # engine's date32 arithmetic exactly
            "WITH d AS (SELECT o_custkey, "
            "CAST(o_orderdate AS DATE) AS day FROM orders), "
            "b AS (SELECT min(day) + CAST("
            "datediff('day', min(day), max(day)) // 2 "
            "AS INTEGER) AS mid FROM d), "
            "early AS (SELECT DISTINCT o_custkey FROM d, b "
            "WHERE day < b.mid), "
            "late AS (SELECT DISTINCT o_custkey FROM d, b "
            "WHERE day >= b.mid) "
            "SELECT o_custkey FROM early "
            "WHERE o_custkey NOT IN (SELECT o_custkey FROM late)"
        ),
        "part_pareto_front": (
            "SELECT p_partkey, p_size, p_retailprice FROM part p "
            "WHERE p.p_size IS NOT NULL AND p.p_retailprice IS NOT NULL "
            "AND NOT EXISTS (SELECT 1 FROM part q "
            "WHERE q.p_size >= p.p_size "
            "AND q.p_retailprice >= p.p_retailprice "
            "AND (q.p_size > p.p_size "
            "OR q.p_retailprice > p.p_retailprice))"
        ),
        "text_pmi_topk": (
            # same case-sensitive whitespace tokenizer as the engine;
            # PMI expression written in the engine's exact op order
            "WITH t AS (SELECT doc_id, "
            "string_split_regex(trim(text), '\\s+') AS tk "
            "FROM documents WHERE length(trim(text)) > 0), "
            "u AS (SELECT doc_id, unnest(tk) AS w, "
            "generate_subscripts(tk, 1) AS pos FROM t), "
            "b AS (SELECT a.w AS w1, c.w AS w2 FROM u a JOIN u c "
            "ON a.doc_id = c.doc_id AND c.pos = a.pos + 1), "
            "g AS (SELECT w1, w2, CAST(count(*) AS BIGINT) AS cnt "
            "FROM b GROUP BY 1, 2 HAVING count(*) >= 5), "
            "un AS (SELECT w, CAST(count(*) AS DOUBLE) AS c "
            "FROM u GROUP BY 1), "
            "nt AS (SELECT CAST(count(*) AS DOUBLE) AS n FROM u), "
            "nb AS (SELECT CAST(count(*) AS DOUBLE) AS n FROM b) "
            "SELECT g.w1, g.w2, g.cnt, "
            "ln((g.cnt / nb.n) / ((ua.c / nt.n) * (ub.c / nt.n))) AS pmi "
            "FROM g JOIN un ua ON g.w1 = ua.w "
            "JOIN un ub ON g.w2 = ub.w CROSS JOIN nt CROSS JOIN nb "
            "ORDER BY pmi DESC, w1, w2 LIMIT 50"
        ),
        "dq_reconcile_orders": (
            "WITH lc AS (SELECT l_orderkey, "
            "sum(l_extendedprice * (1 - l_discount) * (1 + l_tax)) "
            "AS charge FROM lineitem GROUP BY 1) "
            "SELECT CAST(count(*) AS BIGINT) AS n_orders, "
            "CAST(count(*) FILTER (lc.charge IS NULL "
            "OR abs(o_totalprice - lc.charge) > 0.01) AS BIGINT) "
            "AS n_mismatch, "
            "round(max(CASE WHEN lc.charge IS NULL THEN o_totalprice "
            "ELSE abs(o_totalprice - lc.charge) END), 6) "
            "AS max_abs_diff "
            "FROM orders LEFT JOIN lc ON o_orderkey = lc.l_orderkey"
        ),
        "events_new_users_daily": (
            "WITH f AS (SELECT user_id, "
            "CAST(CAST(min(ts) AS DATE) AS VARCHAR) AS day "
            "FROM events GROUP BY 1), "
            "d AS (SELECT day, CAST(count(*) AS BIGINT) AS new_users "
            "FROM f GROUP BY 1) "
            "SELECT day, new_users, "
            "CAST(sum(new_users) OVER (ORDER BY day) AS BIGINT) "
            "AS cum_users FROM d"
        ),
        "events_imputed_means": (
            "SELECT event_id, event_type, "
            "COALESCE(value, avg(value) OVER (PARTITION BY event_type)) "
            "AS value_imp FROM events"
        ),
        "events_minmax_scaled": (
            "WITH b AS (SELECT min(value) AS mn, max(value) AS mx "
            "FROM events WHERE value IS NOT NULL) "
            "SELECT event_id, (value - b.mn) / (b.mx - b.mn) AS scaled "
            "FROM events, b WHERE value IS NOT NULL"
        ),
        "orders_decile_report": (
            "WITH t AS (SELECT o_totalprice, NTILE(10) OVER ("
            "ORDER BY o_totalprice, o_orderkey) AS tile FROM orders "
            "WHERE o_totalprice IS NOT NULL) "
            "SELECT tile, CAST(count(*) AS BIGINT) AS n, "
            "round(sum(o_totalprice), 3) AS total, "
            "min(o_totalprice) AS lo, max(o_totalprice) AS hi "
            "FROM t GROUP BY 1"
        ),
        "orders_backlog_curve": (
            "WITH d AS (SELECT CAST(o_orderdate AS DATE) AS day "
            "FROM orders), "
            "deltas AS (SELECT day, 1 AS delta FROM d "
            "UNION ALL SELECT day + 30, -1 FROM d), "
            "g AS (SELECT day, sum(delta) AS delta "
            "FROM deltas GROUP BY 1) "
            "SELECT CAST(day AS VARCHAR) AS day, "
            "CAST(sum(delta) OVER (ORDER BY day) AS BIGINT) "
            "AS open_orders FROM g"
        ),
        "stats_trimmed_means": (
            "WITH q AS (SELECT event_type, "
            "quantile_cont(value, 0.1) AS lo, "
            "quantile_cont(value, 0.9) AS hi "
            "FROM events WHERE value IS NOT NULL GROUP BY 1) "
            "SELECT e.event_type, CAST(count(*) AS BIGINT) AS n_kept, "
            "avg(e.value) AS trimmed_mean "
            "FROM events e JOIN q USING (event_type) "
            "WHERE e.value IS NOT NULL "
            "AND e.value >= q.lo AND e.value <= q.hi GROUP BY 1"
        ),
        "dq_multivariate_outliers": (
            "WITH s AS (SELECT "
            "avg(l_quantity) AS m1, stddev_samp(l_quantity) AS d1, "
            "avg(l_extendedprice) AS m2, "
            "stddev_samp(l_extendedprice) AS d2, "
            "avg(l_discount) AS m3, stddev_samp(l_discount) AS d3, "
            "avg(l_tax) AS m4, stddev_samp(l_tax) AS d4 FROM lineitem), "
            "z AS (SELECT "
            "((l_quantity - s.m1) / s.d1) * ((l_quantity - s.m1) / s.d1) "
            "+ ((l_extendedprice - s.m2) / s.d2) * "
            "((l_extendedprice - s.m2) / s.d2) "
            "+ ((l_discount - s.m3) / s.d3) * "
            "((l_discount - s.m3) / s.d3) "
            "+ ((l_tax - s.m4) / s.d4) * ((l_tax - s.m4) / s.d4) AS dd "
            "FROM lineitem, s) "
            "SELECT CAST(count(*) AS BIGINT) AS n_rows, "
            "CAST(count(*) FILTER (dd > 16.0) AS BIGINT) AS n_outliers, "
            "round(max(dd), 6) AS max_d2 FROM z"
        ),
        "stats_higher_moments": (
            "SELECT event_type, CAST(count(value) AS BIGINT) AS n, "
            "skewness(value) AS skew, kurtosis(value) AS kurt "
            "FROM events WHERE value IS NOT NULL GROUP BY 1"
        ),
        "stats_welch_ttest": (
            # the SAME power-sum algebra the engine folds — var stated as
            # (ss - n*mean^2)/(n-1), not var_samp, so both sides round
            # identically
            "WITH s AS (SELECT event_type AS g, "
            "CAST(count(value) AS BIGINT) AS n, sum(value) AS s, "
            "sum(value * value) AS ss FROM events "
            "WHERE event_type IN ('purchase', 'view') "
            "AND value IS NOT NULL GROUP BY 1), "
            "a AS (SELECT n, s / n AS m, "
            "(ss - n * (s / n) * (s / n)) / (n - 1) AS v "
            "FROM s WHERE g = 'purchase'), "
            "b AS (SELECT n, s / n AS m, "
            "(ss - n * (s / n) * (s / n)) / (n - 1) AS v "
            "FROM s WHERE g = 'view') "
            "SELECT a.n AS n_a, b.n AS n_b, round(a.m, 6) AS mean_a, "
            "round(b.m, 6) AS mean_b, "
            "round((a.m - b.m) / sqrt(a.v / a.n + b.v / b.n), 6) "
            "AS t_stat, "
            "round(pow(a.v / a.n + b.v / b.n, 2) / "
            "(pow(a.v / a.n, 2) / (a.n - 1) "
            "+ pow(b.v / b.n, 2) / (b.n - 1)), 6) AS df "
            "FROM a, b"
        ),
        "stats_anova_f": (
            "WITH s AS (SELECT event_type AS g, "
            "CAST(count(value) AS BIGINT) AS n, sum(value) AS s, "
            "sum(value * value) AS ss FROM events "
            "WHERE value IS NOT NULL AND event_type IS NOT NULL "
            "GROUP BY 1), "
            "t AS (SELECT CAST(count(*) AS BIGINT) AS k, "
            "CAST(sum(n) AS BIGINT) AS n, sum(s) / sum(n) AS grand "
            "FROM s), "
            "p AS (SELECT sum(s.n * pow(s.s / s.n - t.grand, 2)) "
            "/ (t.k - 1) AS msb, "
            "sum(s.ss - s.n * pow(s.s / s.n, 2)) / (t.n - t.k) AS msw "
            "FROM s, t GROUP BY t.k, t.n) "
            "SELECT t.k, t.n, round(p.msb / p.msw, 6) AS f_stat, "
            "round(p.msb, 6) AS ms_between, round(p.msw, 6) AS ms_within "
            "FROM t, p"
        ),
        "stats_mutual_info": (
            # MI states n*c/(r*c) with exact BIGINT counts inside ln, the
            # identical expression the engine evaluates; entropies from
            # the marginals; Cramer's V over the full grid incl.
            # zero-observed cells (they contribute E)
            "WITH c AS (SELECT lang AS a, source AS b, "
            "CAST(count(*) AS BIGINT) AS n FROM documents "
            "WHERE lang IS NOT NULL AND source IS NOT NULL GROUP BY 1, 2), "
            "rt AS (SELECT a, sum(n) AS rn FROM c GROUP BY 1), "
            "ct AS (SELECT b, sum(n) AS cn FROM c GROUP BY 1), "
            "tot AS (SELECT sum(n) AS nn FROM c), "
            "mi AS (SELECT sum(c.n / tot.nn * "
            "ln(tot.nn * c.n / (rt.rn * ct.cn))) AS mi FROM c "
            "JOIN rt USING (a) JOIN ct USING (b) CROSS JOIN tot "
            "GROUP BY tot.nn), "
            "ha AS (SELECT -sum(rn / tot.nn * ln(rn / tot.nn)) AS h "
            "FROM rt, tot GROUP BY tot.nn), "
            "hb AS (SELECT -sum(cn / tot.nn * ln(cn / tot.nn)) AS h "
            "FROM ct, tot GROUP BY tot.nn), "
            "grid AS (SELECT rt.rn, ct.cn, coalesce(c.n, 0) AS n "
            "FROM rt CROSS JOIN ct "
            "LEFT JOIN c ON c.a = rt.a AND c.b = ct.b), "
            "chi AS (SELECT sum(pow(grid.n - grid.rn * grid.cn / tot.nn, "
            "2) / (grid.rn * grid.cn / tot.nn)) AS chi2 FROM grid, tot "
            "GROUP BY tot.nn) "
            "SELECT CAST(tot.nn AS BIGINT) AS n, round(mi.mi, 6) "
            "AS mi_nats, round(ha.h, 6) AS h_a, round(hb.h, 6) AS h_b, "
            "round(sqrt(chi.chi2 / (tot.nn * (least("
            "(SELECT count(*) FROM rt), (SELECT count(*) FROM ct)) "
            "- 1))), 6) AS cramers_v "
            "FROM tot, mi, ha, hb, chi"
        ),
        "events_peak_concurrency": (
            # 30-min-gap sessions; sweep with +1 before -1 at the same
            # instant (closed-interval overlap), cumulative max
            "WITH e AS (SELECT user_id, ts FROM events "
            "WHERE user_id IS NOT NULL AND ts IS NOT NULL), "
            "l AS (SELECT user_id, ts, CASE WHEN lag(ts) OVER w IS NULL "
            "OR date_diff('microsecond', lag(ts) OVER w, ts) "
            "> 1800000000 THEN 1 ELSE 0 END AS new FROM e "
            "WINDOW w AS (PARTITION BY user_id ORDER BY ts)), "
            "s AS (SELECT user_id, ts, sum(new) OVER "
            "(PARTITION BY user_id ORDER BY ts) AS sid FROM l), "
            "iv AS (SELECT user_id, sid, min(ts) AS st, max(ts) AS en "
            "FROM s GROUP BY 1, 2), "
            "pts AS (SELECT st AS t, 1 AS d FROM iv "
            "UNION ALL SELECT en, -1 FROM iv), "
            "c AS (SELECT sum(d) OVER (ORDER BY t, d DESC) AS run "
            "FROM pts) "
            "SELECT (SELECT CAST(count(*) AS BIGINT) FROM iv) "
            "AS n_sessions, CAST(max(run) AS BIGINT) "
            "AS peak_concurrency FROM c"
        ),
        "events_time_in_state": (
            # exact int64 microsecond sums; ONE cast to DOUBLE at the end
            # (the same exact integer rounds to the same double on both
            # sides), ties broken (ts, event_id)
            "WITH mx AS (SELECT max(ts) AS m FROM events "
            "WHERE user_id IS NOT NULL), "
            "e AS (SELECT user_id, ts, event_id, event_type FROM events "
            "WHERE user_id IS NOT NULL AND ts IS NOT NULL "
            "AND event_type IS NOT NULL), "
            "l AS (SELECT event_type AS state, ts, coalesce(lead(ts) "
            "OVER (PARTITION BY user_id ORDER BY ts, event_id), mx.m) "
            "AS nxt FROM e, mx) "
            "SELECT state, CAST(count(*) AS BIGINT) AS n_intervals, "
            "round(CAST(sum(date_diff('microsecond', ts, nxt)) "
            "AS DOUBLE) / 3600000000.0, 6) AS total_hours "
            "FROM l GROUP BY 1"
        ),
        "orders_rfm_segments": (
            "WITH o AS (SELECT o_custkey AS c, "
            "CAST(date_trunc('day', o_orderdate) AS DATE) "
            "- DATE '1970-01-01' AS d, o_totalprice AS r FROM orders "
            "WHERE o_custkey IS NOT NULL AND o_orderdate IS NOT NULL), "
            "pc AS (SELECT c, max(d) AS last_day, "
            "CAST(count(*) AS BIGINT) AS freq, sum(r) AS mon FROM o "
            "GROUP BY 1), "
            "g AS (SELECT max(last_day) AS gm FROM pc), "
            "a AS (SELECT c, CAST(g.gm - last_day AS DOUBLE) AS recency, "
            "CAST(freq AS DOUBLE) AS freq, mon FROM pc, g), "
            "q AS (SELECT quantile_cont(recency, [0.25, 0.5, 0.75]) "
            "AS qr, quantile_cont(freq, [0.25, 0.5, 0.75]) AS qf, "
            "quantile_cont(mon, [0.25, 0.5, 0.75]) AS qm FROM a), "
            "lab AS (SELECT 1 + CAST(recency > qr[1] AS INT) "
            "+ CAST(recency > qr[2] AS INT) "
            "+ CAST(recency > qr[3] AS INT) AS r_code, "
            "1 + CAST(freq > qf[1] AS INT) + CAST(freq > qf[2] AS INT) "
            "+ CAST(freq > qf[3] AS INT) AS f_code, "
            "1 + CAST(mon > qm[1] AS INT) + CAST(mon > qm[2] AS INT) "
            "+ CAST(mon > qm[3] AS INT) AS m_code, mon FROM a, q) "
            "SELECT CAST(r_code AS BIGINT) AS r_code, "
            "CAST(f_code AS BIGINT) AS f_code, "
            "CAST(m_code AS BIGINT) AS m_code, "
            "CAST(count(*) AS BIGINT) AS n_customers, "
            "round(sum(mon) / count(*), 2) AS avg_monetary "
            "FROM lab GROUP BY 1, 2, 3"
        ),
        "approx_distinct_hll": (
            # identical registers: md5 bridge hash, bucket = top 8 bits,
            # rho = 57 - bit_length(low 56 bits) (bin() is the exact
            # bit length — floor(log2(double)) would round at 2^k edges)
            "WITH h AS (SELECT ('0x' || substring(md5(CAST(user_id AS "
            "VARCHAR)), 1, 16))::UBIGINT AS h FROM events "
            "WHERE user_id IS NOT NULL), "
            "r AS (SELECT CAST(h >> 56 AS BIGINT) AS j, "
            "CASE WHEN (h & ((1::UBIGINT << 56) - 1)) = 0 THEN 57 "
            "ELSE 57 - length(bin(h & ((1::UBIGINT << 56) - 1))) END "
            "AS rho FROM h), "
            "reg AS (SELECT j, max(rho) AS M FROM r GROUP BY j), "
            "agg AS (SELECT sum(pow(2.0, -M)) AS s, "
            "CAST(count(*) AS BIGINT) AS np FROM reg), "
            "f AS (SELECT (0.7213 / (1 + 1.079 / 256.0)) * 256.0 * 256.0 "
            "/ (agg.s + (256 - agg.np)) AS raw, 256 - agg.np AS v "
            "FROM agg) "
            "SELECT CAST(256 AS BIGINT) AS m, CAST(v AS BIGINT) "
            "AS n_zero, round(CASE WHEN raw <= 2.5 * 256 AND v > 0 "
            "THEN 256.0 * ln(256.0 / v) ELSE raw END, 3) AS estimate "
            "FROM f"
        ),
        "cdc_reactivation_rate": (
            # op model shared with the cdc_* family: d = id%10==0,
            # c = id%10 in (1,2); reactivated = a create after a delete
            "WITH p AS (SELECT user_id, "
            "min(CASE WHEN event_id % 10 = 0 THEN event_id END) AS fd, "
            "max(CASE WHEN event_id % 10 IN (1, 2) THEN event_id END) "
            "AS lc FROM events GROUP BY 1) "
            "SELECT CAST(count(*) AS BIGINT) AS n_users, "
            "CAST(sum(CASE WHEN lc > fd THEN 1 ELSE 0 END) AS BIGINT) "
            "AS n_reactivated, "
            "round(sum(CASE WHEN lc > fd THEN 1 ELSE 0 END) * 1.0 "
            "/ count(*), 6) AS rate FROM p"
        ),
        "orders_basket_size_hist": (
            "WITH c AS (SELECT l_orderkey, CAST(count(*) AS BIGINT) "
            "AS basket_size FROM lineitem GROUP BY 1) "
            "SELECT basket_size, CAST(count(*) AS BIGINT) AS n_orders "
            "FROM c GROUP BY 1"
        ),
        "text_token_len_histogram": (
            # same tokenizer as token_lists (lowercase, trim, \s+ split)
            "WITH tok AS (SELECT unnest(string_split_regex(trim(lower("
            "text)), '\\s+')) AS tk FROM documents "
            "WHERE length(trim(text)) > 0) "
            "SELECT CAST(length(tk) AS BIGINT) AS token_len, "
            "CAST(count(*) AS BIGINT) AS n FROM tok GROUP BY 1"
        ),
        "docs_split_balance": (
            # md5-bucket split (shared convention) x the _TOKENS count
            f"WITH s AS (SELECT doc_id, {_TOKENS} AS n_tokens, "
            "('0x' || substring(md5(CAST(doc_id AS VARCHAR)), 1, 16))"
            "::UBIGINT % 100 AS b FROM documents), "
            "c AS (SELECT CASE WHEN b < 80 THEN 'train' WHEN b < 90 "
            "THEN 'val' ELSE 'test' END AS split, "
            "CAST(count(*) AS BIGINT) AS n_docs, "
            "CAST(sum(n_tokens) AS BIGINT) AS n_tokens FROM s GROUP BY 1), "
            "t AS (SELECT sum(n_tokens) AS total FROM c) "
            "SELECT split, n_docs, n_tokens, "
            "round(n_tokens / (SELECT total FROM t), 6) AS token_share "
            "FROM c"
        ),
        "embedding_centroid_angle_hist": (
            # centroid = per-dim mean; cosine rounds to 6dp before the
            # floor so both sides bucket identically
            "WITH e AS (SELECT vec_id, CAST(unnest(embedding) AS DOUBLE) "
            "AS v, generate_subscripts(embedding, 1) AS i FROM embeddings "
            "WHERE embedding IS NOT NULL), "
            "c AS (SELECT i, avg(v) AS m FROM e GROUP BY 1), "
            "d AS (SELECT e.vec_id, sum(e.v * c.m) AS dot, "
            "sum(e.v * e.v) AS vv, sum(c.m * c.m) AS mm "
            "FROM e JOIN c USING (i) GROUP BY 1), "
            "a AS (SELECT vec_id, round(dot / sqrt(vv * mm), 6) AS cos "
            "FROM d) "
            "SELECT CAST(floor(cos / 0.1) AS BIGINT) AS cos_bucket, "
            "CAST(count(*) AS BIGINT) AS n FROM a GROUP BY 1"
        ),
        "events_session_count_hist": (
            # same 30-min session rule as windowed_session_agg; two folds
            "WITH o AS (SELECT user_id, "
            "CASE WHEN epoch_us(ts) - epoch_us(lag(ts) OVER "
            "(PARTITION BY user_id ORDER BY ts)) > 1800000000 "
            "OR lag(ts) OVER (PARTITION BY user_id ORDER BY ts) IS NULL "
            "THEN 1 ELSE 0 END AS new_s FROM events), "
            "c AS (SELECT user_id, CAST(sum(new_s) AS BIGINT) "
            "AS n_sessions FROM o GROUP BY 1) "
            "SELECT n_sessions, CAST(count(*) AS BIGINT) AS n_users "
            "FROM c GROUP BY 1"
        ),
        "events_burstiness": (
            # gaps over (ts asc) per user in SECONDS; population stddev;
            # all-equal-instant users (sd + mean = 0) -> NULL B
            "WITH g AS (SELECT user_id, "
            "(epoch_us(ts) - lag(epoch_us(ts)) OVER "
            "(PARTITION BY user_id ORDER BY ts)) / 1000000.0 AS gap "
            "FROM events WHERE ts IS NOT NULL), "
            "s AS (SELECT user_id, CAST(count(gap) AS BIGINT) AS n_gaps, "
            "avg(gap) AS mu, stddev_pop(gap) AS sd FROM g "
            "WHERE gap IS NOT NULL GROUP BY 1) "
            "SELECT user_id, n_gaps, round(mu, 6) AS mean_gap_s, "
            "CASE WHEN sd + mu > 0 THEN round((sd - mu) / (sd + mu), 6) "
            "ELSE NULL END AS burstiness FROM s"
        ),
        "embedding_norm_histogram": (
            # float64 per-element squares like the engine; round(6)
            # before the floor so both sides bucket identically
            "WITH n AS (SELECT round(sqrt(list_sum(list_transform("
            "CAST(embedding AS DOUBLE[]), x -> x * x))), 6) AS norm "
            "FROM embeddings WHERE embedding IS NOT NULL) "
            "SELECT CAST(floor(norm / 0.25) AS BIGINT) AS norm_bucket, "
            "CAST(count(*) AS BIGINT) AS n FROM n GROUP BY 1"
        ),
        "docs_shingle_df_histogram": (
            _SHINGLES
            + ", df AS (SELECT g, count(*) AS df FROM e GROUP BY 1) "
            "SELECT CAST(floor(log2(df)) AS BIGINT) AS df_bucket, "
            "CAST(count(*) AS BIGINT) AS n_shingles FROM df GROUP BY 1"
        ),
        "dedup_substring_rate": (
            # per-doc DISTINCT char 30-grams, df over docs, dup fraction
            "WITH g AS (SELECT DISTINCT doc_id, "
            "substr(text, CAST(i AS INTEGER), 30) AS gram FROM documents "
            "CROSS JOIN unnest(generate_series(1, length(text) - 29)) "
            "AS t(i) WHERE length(text) >= 30), "
            "df AS (SELECT gram, count(*) AS df FROM g GROUP BY 1) "
            "SELECT doc_id, CAST(count(*) AS BIGINT) AS n_grams, "
            "round(sum(CASE WHEN df >= 2 THEN 1 ELSE 0 END) "
            "/ CAST(count(*) AS DOUBLE), 6) AS dup_rate "
            "FROM g JOIN df USING (gram) GROUP BY 1"
        ),
        "dedup_survivorship": (
            "WITH w AS (SELECT source, doc_id, "
            "row_number() OVER (PARTITION BY text ORDER BY doc_id) AS rn "
            "FROM documents) "
            "SELECT source, CAST(count(*) AS BIGINT) AS n_docs, "
            "CAST(sum(CASE WHEN rn = 1 THEN 1 ELSE 0 END) AS BIGINT) "
            "AS n_kept, "
            "round(sum(CASE WHEN rn = 1 THEN 1 ELSE 0 END) * 1.0 "
            "/ count(*), 6) AS survival_rate FROM w GROUP BY 1"
        ),
        "dedup_minhash_estimate": (
            # recompute the signatures bit-for-bit: gram-string md5 hash,
            # family ((2i+3)*h + 1000003*i+17 mod 2^64) mod (2^61-1)
            # (HUGEINT emulates the engine's uint64 wrap exactly)
            _SHINGLES
            + ", hx AS (SELECT doc_id, "
            "('0x' || substring(md5(g), 1, 16))::UBIGINT AS h FROM e), "
            "ii AS (SELECT unnest(generate_series(0, 15)) AS i), "
            "sig AS (SELECT hx.doc_id, ii.i, "
            "min(CAST(((2 * ii.i + 3)::HUGEINT * hx.h "
            "+ (1000003 * ii.i + 17)) % 18446744073709551616::HUGEINT "
            "% 2305843009213693951::HUGEINT AS UBIGINT)) AS mh "
            "FROM hx CROSS JOIN ii GROUP BY 1, 2), "
            "p AS (SELECT DISTINCT a, b FROM i), "
            "ag AS (SELECT p.a, p.b, "
            "CAST(sum(CASE WHEN sa.mh = sb.mh THEN 1 ELSE 0 END) AS BIGINT)"
            " AS n_match FROM p "
            "JOIN sig sa ON sa.doc_id = p.a "
            "JOIN sig sb ON sb.doc_id = p.b AND sb.i = sa.i "
            "GROUP BY 1, 2) "
            "SELECT a, b, n_match, round(n_match / 16.0, 6) AS est_jaccard "
            "FROM ag WHERE n_match >= 8"
        ),
        "events_hll_by_type": (
            # grouped form of the approx_distinct_hll oracle: identical
            # registers, GROUP BY event_type threaded through every stage
            "WITH h AS (SELECT event_type AS g, "
            "('0x' || substring(md5(CAST(user_id AS VARCHAR)), 1, 16))"
            "::UBIGINT AS h FROM events WHERE user_id IS NOT NULL), "
            "r AS (SELECT g, CAST(h >> 56 AS BIGINT) AS j, "
            "CASE WHEN (h & ((1::UBIGINT << 56) - 1)) = 0 THEN 57 "
            "ELSE 57 - length(bin(h & ((1::UBIGINT << 56) - 1))) END "
            "AS rho FROM h), "
            "reg AS (SELECT g, j, max(rho) AS M FROM r GROUP BY 1, 2), "
            "agg AS (SELECT g, sum(pow(2.0, -M)) AS s, "
            "CAST(count(*) AS BIGINT) AS np FROM reg GROUP BY 1), "
            "f AS (SELECT g, (0.7213 / (1 + 1.079 / 256.0)) * 256.0 * "
            "256.0 / (agg.s + (256 - agg.np)) AS raw, 256 - agg.np AS v "
            "FROM agg) "
            "SELECT g AS event_type, CAST(256 AS BIGINT) AS m, "
            "CAST(v AS BIGINT) AS n_zero, "
            "round(CASE WHEN raw <= 2.5 * 256 AND v > 0 "
            "THEN 256.0 * ln(256.0 / v) ELSE raw END, 3) AS estimate "
            "FROM f"
        ),
        "orders_cohort_ltv": (
            # months as int indices 12*year + month-1, the engine's exact
            # expression; cumulative revenue per cohort in age order
            "WITH o AS (SELECT o_custkey AS c, "
            "12 * year(o_orderdate) + month(o_orderdate) - 1 AS m, "
            "o_totalprice AS r FROM orders "
            "WHERE o_custkey IS NOT NULL AND o_orderdate IS NOT NULL), "
            "f AS (SELECT c, CAST(min(m) AS BIGINT) AS cm FROM o "
            "GROUP BY 1), "
            "sz AS (SELECT cm AS cohort, CAST(count(*) AS BIGINT) "
            "AS n_customers FROM f GROUP BY 1), "
            "cell AS (SELECT f.cm AS cohort, CAST(o.m - f.cm AS BIGINT) "
            "AS age, sum(o.r) AS rev FROM o JOIN f USING (c) "
            "GROUP BY 1, 2), "
            "cum AS (SELECT cohort, age, rev, sum(rev) OVER "
            "(PARTITION BY cohort ORDER BY age) AS cum_rev FROM cell) "
            "SELECT cum.cohort, cum.age, sz.n_customers, "
            "round(cum.rev, 2) AS revenue, "
            "round(cum.cum_rev / sz.n_customers, 6) AS ltv_per_customer "
            "FROM cum JOIN sz ON sz.cohort = cum.cohort"
        ),
        "events_survival_km": (
            # KM over hour-bucketed durations; ties broken (ts, event_id)
            # on both sides; the terminal d = n_risk row is survival 0
            # explicitly (ln(0) is an error, not -inf, in SQL)
            "WITH b AS (SELECT user_id, ts, row_number() OVER "
            "(PARTITION BY user_id ORDER BY ts, event_id) AS rn "
            "FROM events WHERE user_id IS NOT NULL AND ts IS NOT NULL), "
            "mx AS (SELECT max(ts) AS m FROM events "
            "WHERE user_id IS NOT NULL AND ts IS NOT NULL), "
            "f AS (SELECT user_id, "
            "min(CASE WHEN rn = 1 THEN ts END) AS t1, "
            "min(CASE WHEN rn = 2 THEN ts END) AS t2 FROM b GROUP BY 1), "
            "d AS (SELECT CASE WHEN t2 IS NOT NULL THEN "
            "date_diff('microsecond', t1, t2) ELSE "
            "date_diff('microsecond', t1, mx.m) END // 3600000000 AS t, "
            "CASE WHEN t2 IS NOT NULL THEN 1 ELSE 0 END AS e "
            "FROM f, mx), "
            "g AS (SELECT t, CAST(sum(e) AS BIGINT) AS d, "
            "CAST(count(*) AS BIGINT) AS c FROM d GROUP BY 1), "
            "o AS (SELECT t, d, CAST(sum(c) OVER (ORDER BY t DESC) "
            "AS BIGINT) AS n_risk FROM g), "
            "s AS (SELECT t, d, n_risk, "
            "exp(sum(ln(CASE WHEN d < n_risk THEN 1 - d * 1.0 / n_risk "
            "ELSE 1 END)) OVER (ORDER BY t)) AS raw, "
            "max(CASE WHEN d = n_risk THEN 1 ELSE 0 END) OVER "
            "(ORDER BY t) AS dead FROM o WHERE d > 0) "
            "SELECT t AS t_hours, n_risk, d AS d_events, "
            "round(CASE WHEN dead = 1 THEN 0 ELSE raw END, 6) "
            "AS survival FROM s"
        ),
        "stats_theilsen_daily": (
            # x = epoch days (date - epoch is BIGINT days in DuckDB),
            # matching the engine's date32 cast; median of an even count
            # interpolates the middle two on both sides
            "WITH d AS (SELECT CAST(date_trunc('day', ts) AS DATE) "
            "- DATE '1970-01-01' AS day, "
            "CAST(count(*) AS DOUBLE) AS n FROM events "
            "WHERE ts IS NOT NULL GROUP BY 1), "
            "p AS (SELECT (y.n - x.n) / (y.day - x.day) AS slope "
            "FROM d x JOIN d y ON x.day < y.day), "
            "sl AS (SELECT quantile_cont(slope, 0.5) AS s FROM p), "
            "ic AS (SELECT quantile_cont(d.n - sl.s * d.day, 0.5) AS i "
            "FROM d, sl GROUP BY sl.s) "
            "SELECT (SELECT CAST(count(*) AS BIGINT) FROM d) AS n_days, "
            "round(sl.s, 6) AS slope_per_day, round(ic.i, 6) "
            "AS intercept FROM sl, ic"
        ),
        "text_cosine_pairs": (
            # df-filtered tf-idf cosine; ties at the k boundary break
            # (cosine desc, a, b) — qualified c.cosine so ORDER BY uses
            # the raw value, not a rounded alias
            "WITH tok AS (SELECT doc_id, unnest(string_split_regex("
            "trim(text), '\\s+')) AS term FROM documents "
            "WHERE length(trim(text)) > 0), "
            "tf AS (SELECT doc_id, term, CAST(count(*) AS DOUBLE) AS tf "
            "FROM tok GROUP BY 1, 2), "
            "df AS (SELECT term, CAST(count(*) AS DOUBLE) AS df "
            "FROM tf GROUP BY 1), "
            "nd AS (SELECT CAST(count(DISTINCT doc_id) AS DOUBLE) AS n "
            "FROM tf), "
            "kept AS (SELECT term, df FROM df "
            "WHERE df >= 2 AND df <= 0.06 * (SELECT n FROM nd)), "
            "w AS (SELECT tf.doc_id, tf.term, "
            "tf.tf * ln(nd.n / kept.df) AS w "
            "FROM tf JOIN kept USING (term) CROSS JOIN nd), "
            "norms AS (SELECT doc_id, sqrt(sum(w * w)) AS nrm "
            "FROM w GROUP BY 1), "
            # unit-vector formulation, mirroring the engine: normalize
            # each posting by its doc norm BEFORE pairing — the dot of
            # unit vectors IS the cosine
            "wn AS (SELECT w.doc_id, w.term, w.w / norms.nrm AS wn "
            "FROM w JOIN norms USING (doc_id)), "
            "c AS (SELECT x.doc_id AS a, y.doc_id AS b, "
            "sum(x.wn * y.wn) AS cosine FROM wn x "
            "JOIN wn y ON x.term = y.term AND x.doc_id < y.doc_id "
            "GROUP BY 1, 2) "
            "SELECT a, b, cosine FROM c "
            "ORDER BY c.cosine DESC, a ASC, b ASC LIMIT 50"
        ),
        "events_top_user": (
            "WITH c AS (SELECT event_type, user_id, "
            "CAST(count(*) AS BIGINT) AS cnt FROM events GROUP BY 1, 2), "
            "r AS (SELECT event_type, user_id, cnt, "
            "ROW_NUMBER() OVER (PARTITION BY event_type "
            "ORDER BY cnt DESC, user_id ASC) AS rn FROM c) "
            "SELECT event_type, user_id, cnt FROM r WHERE rn = 1"
        ),
        "stats_ntile": (
            "SELECT o_orderkey, o_totalprice, "
            "ROW_NUMBER() OVER (ORDER BY o_totalprice, o_orderkey) AS rn, "
            "NTILE(8) OVER (ORDER BY o_totalprice, o_orderkey) AS tile "
            "FROM orders WHERE o_totalprice IS NOT NULL"
        ),
        "stats_global_quantiles": (
            "SELECT unnest([0.1, 0.25, 0.5, 0.75, 0.9, 0.99]) AS q, "
            "unnest(quantile_cont(value, "
            "[0.1, 0.25, 0.5, 0.75, 0.9, 0.99])) AS value "
            "FROM events WHERE value IS NOT NULL"
        ),
        "stats_winsorized_means": (
            "WITH b AS (SELECT quantile_cont(value, 0.05) AS lo, "
            "quantile_cont(value, 0.95) AS hi "
            "FROM events WHERE value IS NOT NULL) "
            "SELECT event_type, CAST(count(*) AS BIGINT) AS n, "
            "avg(CASE WHEN value < b.lo THEN b.lo "
            "WHEN value > b.hi THEN b.hi ELSE value END) AS wmean "
            "FROM events, b WHERE value IS NOT NULL GROUP BY 1"
        ),
    }
    # the MoR patch-delta drive folds to the same per-cell state as CoW
    out["cdc_partial_mor"] = out["cdc_partial_updates"]
    # counter column: identical per-cell oracle except `value` ACCUMULATES
    # over the live set events instead of taking the last writer
    out["cdc_counter_col"] = out["cdc_partial_updates"].replace(
        "arg_max({'v': value}, lsn) FILTER (((mask >> 3) & 1) = 1)['v'] "
        "AS value",
        "SUM(value) FILTER (((mask >> 3) & 1) = 1) AS value",
    )
    assert "SUM(value)" in out["cdc_counter_col"]
    # index-backed IVF search must equal the in-memory assignment exactly
    out["ann_ivf_index_topk"] = out["ann_ivf_topk"]
    # the incrementally-refreshed join view converges to the same state
    # as the one-shot co-partitioned join
    out["cdc_join_view"] = out["cdc_lake_join"]
    return out
