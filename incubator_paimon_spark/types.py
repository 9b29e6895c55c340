"""Row kinds and system columns.

Mirrors the reference's changelog row model:
- RowKind flags: paimon-common/src/main/java/org/apache/paimon/types/RowKind.java:29-56
- System columns (_SEQUENCE_NUMBER, _VALUE_KIND): paimon-core/src/main/java/org/apache/paimon/schema/SystemColumns.java:25-40

Spark has no native changelog-row concept, so the kind travels as a short
string column ("+I", "-U", "+U", "-D"); PK data files persist the
``_SEQUENCE_NUMBER`` (long) and ``_VALUE_KIND`` (string) columns alongside
user fields exactly like the reference persists its KeyValue envelope.
"""

from __future__ import annotations

# RowKind short strings (RowKind.java:29-56)
INSERT = "+I"
UPDATE_BEFORE = "-U"
UPDATE_AFTER = "+U"
DELETE = "-D"

ALL_KINDS = (INSERT, UPDATE_BEFORE, UPDATE_AFTER, DELETE)
ADD_KINDS = (INSERT, UPDATE_AFTER)
RETRACT_KINDS = (UPDATE_BEFORE, DELETE)

# System column names (SystemColumns.java:25-40). We keep the reference's
# reserved names so users migrating tables see familiar columns.
SEQUENCE_NUMBER = "_SEQUENCE_NUMBER"
VALUE_KIND = "_VALUE_KIND"
ROW_KIND = "_row_kind"  # user-facing changelog input column + $audit_log column
ROW_ID = "_ROW_ID"

SYSTEM_COLUMNS = (SEQUENCE_NUMBER, VALUE_KIND)

# Commit kinds (Snapshot.java:506-515)
COMMIT_APPEND = "APPEND"
COMMIT_COMPACT = "COMPACT"
COMMIT_OVERWRITE = "OVERWRITE"
COMMIT_ANALYZE = "ANALYZE"

# Manifest entry kinds (ManifestEntry.java:41-48)
ENTRY_ADD = "ADD"
ENTRY_DELETE = "DELETE"
