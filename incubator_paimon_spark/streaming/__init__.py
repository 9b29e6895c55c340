from .source import (incremental_between, changelog_between,  # noqa: F401
                     MicroBatchStream, stream_changes)
from .sink import write_stream, ExactlyOnceBatchSink  # noqa: F401
