"""Engine configuration.

Mirrors the reference's user-extension surface (CassandraConnectorConfig.java:
27-50,74-81,161-230; OracleConnectorConfig.java:248-318): snapshot mode, field
blacklist, tombstones, table filters, batch sizing — re-expressed as Ray Data
knobs (num lake partitions, actor-pool concurrency, batch/block sizes).
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Sequence


@dataclasses.dataclass
class EngineConfig:
    """Configuration for one CDC-ingested lake table.

    Scale notes (100 TB / multi-node): ``num_partitions`` is the unit of
    parallelism for the apply shuffle AND the unit of commit/resume — size it
    to ~(cluster cores × 2..4). ``apply_concurrency`` is the actor-pool size
    of the merge stage; ``target_rows_per_file`` bounds the sorted runs so
    copy-on-write rewrites touch only affected runs, not whole partitions.
    """

    # identity
    table: str = "pages"
    key: str = "url"
    # composite primary key (reference: key = ALL pk cells, partition +
    # clustering columns — RecordMaker.java:36-58 buildKey). When set
    # (2+ columns), the engine derives an internal routing/sort column
    # ``_key`` = the string-cast components joined with '|' (components
    # must not contain the separator; exact for ints). ``_key`` lives in
    # the lake runs like ``_lsn`` and is dropped from user-facing reads;
    # ``key`` is ignored. Delete events extract every component from the
    # before image, same as the single-column path.
    key_cols: Optional[Sequence[str]] = None

    # partitioning (the one big shuffle — hash(key) % num_partitions)
    num_partitions: int = 16
    # "mod" for integer keys (SQL-oracle-expressible: key % P), "hash" for
    # strings (the in-repo version-pinned hash, hashing.HASH_IMPL).
    partitioner: str = "hash"

    # apply stage (stateful actor pool)
    apply_concurrency: Optional[int] = None  # None → Ray decides (tasks)
    apply_num_cpus: float = 1.0

    # read / batch sizing. None = per input block (preserves the read's
    # block count; an explicit large batch_size coalesces the stream into
    # few mega-blocks and caps the parallelism of every downstream stage —
    # measured 12-way on a 32-CPU run before this default)
    read_batch_size: Optional[int] = None
    target_rows_per_file: int = 1_000_000  # sorted-run length in the lake

    # exchange implementation for the partition shuffle:
    #   "staging" (default): disk-backed external shuffle — map tasks split
    #     blocks by partition into staging parquet, appliers read exactly
    #     their listed files (see stages/exchange.py; measured ~10x faster
    #     than the object-store AllToAll in this environment);
    #   "objref": locality-aware object-store exchange for multi-node
    #     clusters WITHOUT a shared staging filesystem — per-partition
    #     LZ4-IPC slices staged as driver-owned objects on the node that
    #     produced them; appliers scheduled by arg locality (only the lake
    #     dir needs shared storage; see stages/exchange.py);
    #   "groupby": Ray Data's native sort-based groupby exchange.
    exchange: str = "staging"
    # objref per-node slice combine: on a MULTI-node cluster, gather each
    # node's LZ4 slices per partition into one object between split and
    # apply (stages/exchange.py combine_slices), so stage 2 fetches one
    # object per producing node instead of one per (block × partition) —
    # per-object store metadata + per-fetch gRPC round-trips were the
    # measured 2-node plateau of the fine-grained fan-out. Raw
    # (uncompressed) block bytes never cross nodes either way: splits
    # schedule by block locality, combines pin to the producing node.
    # Automatically a no-op on single-node clusters.
    exchange_combine: bool = True
    # staging writer batch sizing: staging files ≈ (rows / batch) × touched
    # partitions, and writer parallelism ≈ rows / batch. 32768 balances the
    # two failure modes measured here: batch=None left a 1.6M-row snapshot
    # as 256 blocks × 64 partitions = 16k tiny files (file overhead
    # dominated, 3x run variance), while 65536 capped a 400k-row snapshot
    # at ~6 writer tasks.
    staging_batch_size: Optional[int] = 32768

    # blocks fed into the partition shuffle. The sort exchange costs
    # O(blocks²) object-store fragments and map_groups re-concatenates
    # group fragments that straddle block boundaries, so a moderate count
    # of large blocks beats hundreds of small ones (measured 2× on 800k
    # events). None → min(num_partitions, 32). Deterministic (not a
    # function of CPU count) so the same job runs at any cluster size.
    shuffle_blocks: Optional[int] = None

    # optional salted two-phase LWW pre-reduce for skewed epochs
    # (north-rule skew handling: hot keys are collapsed per (partition, salt)
    # before the final per-partition shuffle). 0 disables the extra shuffle;
    # in-batch partial reduce always runs and already bounds hot-key fan-in
    # to one row per key per input block.
    salt_buckets: int = 0
    # AUTO-salting from lineage skew stats: when salt_buckets is 0, the
    # salted pre-reduce engages for an epoch if the PREVIOUS epoch's
    # committed lineage skew_ratio (rows_per_partition max/mean) crossed
    # this threshold — the feedback loop hot-url Zipfian streams need
    # without hand-tuning. None disables auto; salt_buckets > 1 remains
    # the always-on manual override. The decision (engaged or not, the
    # skew that drove it) is recorded in the epoch's lineage row.
    salt_auto_threshold: Optional[float] = 4.0
    salt_auto_buckets: int = 16

    # filters (reference: FieldFilterSelector.java:28-50, table include
    # regex OracleConnectorConfig.java:101-103,325-348)
    field_blacklist: Sequence[str] = ()
    table_include_regex: Optional[str] = None

    # delete semantics (TombstoneRecord.java:11-24 + tombstones.on.delete,
    # CassandraConnectorConfig.java:223-229):
    #   True  (default): deletes are fully compacted — the key's row is
    #     removed from the lake (the Kafka-log-compaction outcome). Safe
    #     because the watermark guarantees no older event re-applies.
    #   False: deleted keys are RETAINED as tombstone marker rows
    #     (payload nulls + ``_deleted=true`` column) so downstream consumers
    #     can observe deletions — the compacted-topic-without-tombstone
    #     behavior. Recorded in the manifest (table semantics, not a knob).
    tombstones: bool = True

    # merge semantics (manifest-recorded — table semantics, not a knob):
    #   "lww" (default): full-row last-writer-wins — the max-LSN event's
    #     whole image replaces the row (Kafka log-compaction contract).
    #   "partial": per-CELL last-writer-wins — events carry a modified-cell
    #     bitmask (envelope column ``set_mask``, bit j = writer payload
    #     field j; null/absent = full row) and unset cells inherit the
    #     current lake value; a row deletion shadows all older cells, so a
    #     later partial update re-creates the row with ONLY its own cells.
    #     This is Cassandra's real mutation shape (RowData carries only the
    #     modified cells, RowData.java:28-33 + CellData.java:23-60) — the
    #     reference relies on downstream Kafka consumers to merge; here the
    #     lake IS that consumer. Requires tombstones=True + sink_mode="cow"
    #     (a delta/tombstone row cannot represent "cell not touched").
    merge_mode: str = "lww"

    # row-level constraints enforced at normalize time (Delta-style table
    # CHECK constraints + the dead-letter discipline, vectorized): each
    # rule is (column, kind, arg) with kind in {"not_null", "min", "max",
    # "regex"}. A c/u/r event violating ANY rule is dropped before apply
    # (the prior lake value survives, exactly as if the event never
    # arrived); deletes are exempt (their payload is null by contract).
    # Dropped rows surface as delivered-vs-applied deltas in lineage.
    constraints: Sequence[tuple] = ()

    # column value redaction applied at normalize AND on both snapshot
    # paths (the Debezium column SMT knobs — column.mask.with.length.chars,
    # column.truncate.to.length.chars, column.mask.hash.* — as engine
    # config; the projection analog is FieldFilterSelector.java:28-50).
    # Each rule is (column, kind[, arg]) with kind in {"mask", "truncate",
    # "hash"}: mask → non-null values become '*' × arg; truncate → first
    # arg characters; hash → md5 hex digest (the cross-engine-verifiable
    # digest; computed once per distinct value). NULLs stay NULL; string
    # payload columns only; the key column(s) are refused.
    column_transforms: Sequence[tuple] = ()

    # schema-compatibility gate for DDL arriving on the binlog (the
    # schema-registry compatibility level applied at the lake instead of
    # at a registry; Debezium deployments put Confluent's BACKWARD gate
    # between the connector and consumers — here the lake enforces it):
    #   "full" (default): add_column, widen_type and drop_column allowed
    #     (the engine's historical behavior);
    #   "backward": drop_column REFUSED — downstream readers compiled
    #     against the current schema keep working; add/widen allowed;
    #   "additive": only add_column allowed — the strictest contract.
    # A refused change aborts the epoch BEFORE any data is applied; fix
    # the stream (or relax the level) and re-run.
    schema_compatibility: str = "full"

    # counter columns (Cassandra counter tables): in merge_mode="partial",
    # SET cells of these numeric columns ACCUMULATE (sum of live
    # contributions since the key's last row deletion) instead of
    # last-writer-wins — the additive-CRDT merge a counter mutation
    # stream needs. NULL contributions are skipped; a cell with no
    # non-null contribution is null. Manifest-recorded table semantics.
    counter_cols: Sequence[str] = ()

    # sink write mode (recorded in the manifest — table semantics, not a
    # per-run knob):
    #   "cow" (default): copy-on-write — every epoch rewrites the sorted
    #     runs its keys touch. Read-optimal (a run IS the live state);
    #     write cost O(epoch ∪ affected runs).
    #   "mor": merge-on-read — epochs append compact key-sorted DELTA runs
    #     (payload + _lsn + _deleted markers) and never rewrite the base;
    #     readers LWW-merge base ⊕ deltas per partition and ``compact()``
    #     folds deltas back into base runs. Write cost O(epoch) — the right
    #     trade for hot partitions / high-frequency epochs at 100 TB where
    #     CoW's rewrite amplification dominates (every epoch rewriting a
    #     1M-row run to apply 1k events).
    sink_mode: str = "cow"

    # MoR auto-compaction: after an epoch commit, fold any partition whose
    # outstanding delta-run count reached this threshold back into its base
    # runs. Bounds read amplification (every scan merges at most N-1 deltas
    # per partition) without hand-scheduled compaction. None = manual
    # compact() only. Ignored in CoW mode.
    mor_compact_deltas: Optional[int] = None

    # offset-flush policy (OffsetFlushPolicy.java:19-51): when the manifest
    # CURRENT pointer is persisted to the store.
    #   "always" (default): persist every commit — tightest resume point.
    #   "periodic": persist when offset_flush_interval_s has elapsed OR
    #     offset_flush_max_events have been processed since the last flush
    #     (whichever first) — fewer control-plane writes on fast tail loops;
    #     a crash idempotently replays the epochs since the last flush.
    # Structural commits (snapshot completion, schema changes) always flush.
    offset_flush: str = "always"
    offset_flush_interval_s: float = 10.0
    offset_flush_max_events: int = 1_000_000

    # snapshot mode: ALWAYS / INITIAL / NEVER
    # (CassandraConnectorConfig.java:74-81)
    snapshot_mode: str = "INITIAL"

    # process only the newest not-yet-applied segment per binlog partition —
    # the reference's test-only latest-commit-log mode
    # (CommitLogProcessor.java:115-134; config :237-238). Skipped older
    # segments are still marked done.
    latest_only: bool = False

    # TRUNCATE TABLE events (op='t', the Debezium truncate record): when
    # enabled, a truncate envelope wipes every row whose LSN is <= the
    # truncate's LSN — later events in the same epoch survive and re-create
    # their keys. Normalize fans the (keyless) control event out to every
    # lake partition on the exchange path; on the aligned path the producer
    # must replicate the marker into each binlog partition's log (the same
    # contract as any per-partition control record). Off by default: op='t'
    # rows are then skipped like any other unsupported mutation kind.
    truncate_events: bool = False

    # zone maps: per-run min/max statistics recorded in the manifest for
    # these payload columns (int/float/string/timestamp), enabling
    # CdcEngine.scan(col, lo, hi) to prune whole runs at the read — the
    # lakehouse "prune at the read" discipline for non-key predicates.
    # Table policy (manifest-recorded). Runs are key-sorted, so zone maps
    # pay off for columns correlated with the key or with write time.
    stats_columns: Sequence[str] = ()

    # SSTable-style per-run key Bloom filters (Cassandra's own point-read
    # discipline — the reference's source DB keeps one per SSTable): bits
    # PER KEY (0 = off; 10 ≈ 1% false positives with 4 hashes). Each run
    # write drops a `<run>.bloom` sidecar; lookup() probes it and skips
    # runs that DEFINITELY lack every wanted key — negative lookups and
    # merge-on-read delta stacks (overlapping key ranges) stop paying a
    # parquet read per covering run. Table policy (manifest-recorded).
    bloom_filter_bits: int = 0

    # transaction-boundary apply (Debezium's transaction-metadata contract:
    # consumers see only COMPLETE transactions). Envelope streams carry
    # optional top-level ``tx_id``/``tx_events`` columns (total events the
    # transaction wrote); an epoch applies, per partition, only the LSN
    # prefix below the first incomplete transaction — the rest defers to a
    # later epoch (their segments stay un-done, the watermark advances only
    # over applied rows, so redelivery is exact). Transactions must be
    # partition-local (a cross-partition tx would need 2PC); supported on
    # the aligned path only.
    transactional: bool = False

    # processed-segment relocation (CommitLogTransfer.java:15-35,
    # BlackHoleCommitLogTransfer.java:14-24, QueueProcessor.java:29-30
    # ARCHIVE_FOLDER/ERROR_FOLDER): what happens to a binlog segment file
    # once this lake is finished with it.
    #   "none" (default): leave segments in place — segments_done already
    #     makes redelivery a no-op, and other consumers may need the files.
    #   "archive": move applied segments to <relocation_dir>/archive/<rel>
    #     and quarantined segments to <relocation_dir>/error/<rel>.
    #   "delete": remove both (the BlackHole transfer).
    # Transfers happen only AFTER the manifest flush that records the
    # segment done/errored has persisted (transfer forces the flush), so a
    # crash can never strand a moved-but-unrecorded file. Requires this
    # lake to own the binlog dir exclusively (do not combine with demux
    # or a second lake over the same directory).
    segment_transfer: str = "none"
    relocation_dir: Optional[str] = None  # default: <binlog_dir>/_relocation

    # partition-aligned fast path: when the binlog directory layout
    # (p=<p>/seg-*.parquet) has the same partition count as the lake, each
    # binlog partition feeds exactly one lake partition, so the epoch skips
    # the exchange entirely (read p's segments → normalize → apply p) — the
    # dominant cost of the shuffle path disappears. Routing is validated
    # per batch (every normalized row must land in partition p; a mismatch
    # aborts the epoch before any commit).
    #   "auto" (default): use when binlog partition count == num_partitions;
    #   "never": always exchange (e.g. binlog partitioned by a foreign key).
    aligned_binlog: str = "auto"

    def partition_of(self, key_array):
        """Vectorized partition id for an Arrow array of keys."""
        from debezium_incubator_ray.hashing import partition_ids

        return partition_ids(key_array, self.num_partitions, self.partitioner)
