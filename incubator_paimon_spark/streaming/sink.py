"""Streaming sink: foreachBatch → exactly-once table commits.

Reference: PaimonSink.scala (Structured Streaming sink) committing with
commitIdentifier = batchId; replays are filtered by identifier
(TableCommitImpl.filterAndCommit), which our FileStoreCommit.commit
reproduces — a retried batchId becomes a no-op.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


class ExactlyOnceBatchSink:
    """Use as: stream.writeStream.foreachBatch(ExactlyOnceBatchSink(table)).start()"""

    def __init__(self, table, overwrite: bool = False):
        self.table = table
        self.overwrite = overwrite

    def __call__(self, batch_df: DataFrame, batch_id: int):
        spark = batch_df.sparkSession
        self.table.new_write().write(
            spark, batch_df,
            overwrite=True if self.overwrite else None,
            commit_identifier=batch_id)


def write_stream(table, stream_df, checkpoint_dir: str, trigger_once: bool = True,
                 **foreach_kw):
    """Wire a streaming DataFrame into the table with exactly-once commits."""
    writer = (stream_df.writeStream
              .foreachBatch(ExactlyOnceBatchSink(table, **foreach_kw))
              .option("checkpointLocation", checkpoint_dir))
    if trigger_once:
        writer = writer.trigger(availableNow=True)
    return writer.start()
