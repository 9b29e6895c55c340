from .schema import DataField, TableSchema, SchemaManager  # noqa: F401
from .snapshot import Snapshot, SnapshotManager  # noqa: F401
from .manifest import DataFileMeta, ManifestEntry, ManifestStore  # noqa: F401
from .commit import FileStoreCommit, CommitMessage, ConflictError  # noqa: F401
