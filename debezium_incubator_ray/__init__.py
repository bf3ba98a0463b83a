"""debezium_incubator_ray — a Ray-Data-native CDC / incremental-ingest engine.

A from-scratch rebuild of the *capabilities* of ndustrialio/debezium-incubator
(Debezium Cassandra + Oracle/XStream source connectors) as an idiomatic Ray
Data pipeline: Debezium-style change envelopes (op=c/u/d/r, before/after
images, per-partition LSN offsets) are consumed from a simulated binlog/WAL
tail as ``ray.data.Dataset`` micro-batches, hash-partitioned by key, and
applied to Parquet lake tables through stateful actor-pool ``map_batches`` /
``map_groups`` stages performing last-writer-wins merge with per-partition
max-LSN watermarks, copy-on-write rewrite of affected sorted runs, tombstone
compaction, Debezium-semantics schema evolution, and exactly-once atomic
manifest commits.

This is NOT a port: the reference is a single-process, thread-per-stage Java
agent (see /root/reference, e.g. CassandraConnectorTask.java:164-229); this
engine re-expresses the same semantics on Ray Data's streaming executor.
"""

from debezium_incubator_ray.config import EngineConfig
from debezium_incubator_ray.pipelines.cdc import CdcEngine

__all__ = ["EngineConfig", "CdcEngine"]
__version__ = "0.1.0"
