/*
 * A DSv2 TableCatalog for incubator_paimon_spark tables, so plain
 * `spark.sql("SELECT ... FROM <cat>.<db>.<table>")` works with no
 * attach()/register-view step (the reference's SparkCatalog surface:
 * paimon-spark/paimon-spark-common/.../SparkCatalog.java:61).
 *
 * Design: the ENGINE stays in Python. loadTable resolves the identifier
 * to the table directory, asks the session to build the Python
 * DataSource relation for it (spark.read.format("paimon")), and unwraps
 * Spark's own connector Table from the analyzed plan -- so scans,
 * filter pushdown, merge-on-read and streaming all run through exactly
 * the code the format("paimon") path uses. This class is therefore a
 * NAME RESOLVER, not a second engine; DDL stays on the Python API
 * (create/drop/alter raise with a pointer there).
 *
 * The Python side compiles this lazily with the JDK's javac when a
 * caller asks for SQL catalog installation (jvm_catalog.py); no build
 * system or bundled jar is involved.
 */
package org.apache.paimon.pyspark;

import java.io.File;
import java.util.ArrayList;
import java.util.Collections;
import java.util.List;
import java.util.Map;

import com.fasterxml.jackson.databind.JsonNode;
import com.fasterxml.jackson.databind.ObjectMapper;

import org.apache.spark.sql.Dataset;
import org.apache.spark.sql.Row;
import org.apache.spark.sql.SparkSession;
import org.apache.spark.sql.catalyst.analysis.NamespaceAlreadyExistsException;
import org.apache.spark.sql.catalyst.analysis.NoSuchNamespaceException;
import org.apache.spark.sql.catalyst.analysis.NoSuchTableException;
import org.apache.spark.sql.catalyst.analysis.NonEmptyNamespaceException;
import org.apache.spark.sql.catalyst.analysis.TableAlreadyExistsException;
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan;
import org.apache.spark.sql.connector.catalog.Identifier;
import org.apache.spark.sql.connector.catalog.NamespaceChange;
import org.apache.spark.sql.connector.catalog.SupportsNamespaces;
import org.apache.spark.sql.connector.catalog.Table;
import org.apache.spark.sql.connector.catalog.TableCatalog;
import org.apache.spark.sql.connector.catalog.TableChange;
import org.apache.spark.sql.connector.expressions.Transform;
import org.apache.spark.sql.execution.datasources.v2.DataSourceV2Relation;
import org.apache.spark.sql.types.StructType;
import org.apache.spark.sql.util.CaseInsensitiveStringMap;

public class PaimonSparkCatalog implements TableCatalog, SupportsNamespaces {

    private String name;
    private String warehouse;

    @Override
    public void initialize(String name, CaseInsensitiveStringMap options) {
        this.name = name;
        this.warehouse = options.get("warehouse");
        if (this.warehouse == null) {
            throw new IllegalArgumentException(
                    "spark.sql.catalog." + name + ".warehouse is required");
        }
    }

    @Override
    public String name() {
        return name;
    }

    private File dbDir(String db) {
        return new File(warehouse, db + ".db");
    }

    private File tableDir(Identifier ident) {
        // `t$branch_<name>` resolves to the branch's own table dir
        // (branches are copy-on-write metadata forks living under
        // <table>/branch/<name> -- the reference's $branch_ SQL suffix)
        String name = ident.name();
        int i = name.indexOf("$branch_");
        if (i > 0) {
            return new File(
                    new File(dbDir(ident.namespace()[0]),
                            name.substring(0, i)),
                    "branch/" + name.substring(i + "$branch_".length()));
        }
        return new File(dbDir(ident.namespace()[0]), name);
    }

    private static boolean isTableDir(File dir) {
        return new File(dir, "schema").isDirectory();
    }

    // ------------------------------------------------------------------
    // tables
    @Override
    public Identifier[] listTables(String[] namespace)
            throws NoSuchNamespaceException {
        if (namespace.length != 1 || !dbDir(namespace[0]).isDirectory()) {
            throw new NoSuchNamespaceException(namespace);
        }
        List<Identifier> out = new ArrayList<>();
        File[] children = dbDir(namespace[0]).listFiles();
        if (children != null) {
            for (File c : children) {
                if (c.isDirectory() && isTableDir(c)) {
                    out.add(Identifier.of(namespace, c.getName()));
                }
            }
        }
        Collections.sort(out, (a, b) -> a.name().compareTo(b.name()));
        return out.toArray(new Identifier[0]);
    }

    @Override
    public Table loadTable(Identifier ident) throws NoSuchTableException {
        return loadWith(ident, null, null);
    }

    @Override
    public Table loadTable(Identifier ident, String version)
            throws NoSuchTableException {
        // VERSION AS OF: a number is a snapshot id, anything else a tag
        // (the same resolution the reference's SparkCatalog applies)
        if (version.chars().allMatch(Character::isDigit)) {
            return loadWith(ident, "snapshot-id", version);
        }
        return loadWith(ident, "scan.tag-name", version);
    }

    @Override
    public Table loadTable(Identifier ident, long timestampMicros)
            throws NoSuchTableException {
        // Spark hands TIMESTAMP AS OF in MICROseconds
        return loadWith(
                ident,
                "scan.timestamp-millis",
                String.valueOf(timestampMicros / 1000L));
    }

    private Table loadWith(Identifier ident, String key, String value)
            throws NoSuchTableException {
        if (ident.namespace().length != 1 || !isTableDir(tableDir(ident))) {
            throw new NoSuchTableException(ident);
        }
        java.util.HashMap<String, String> extra = new java.util.HashMap<>();
        extra.put("path", tableDir(ident).getAbsolutePath());
        if (key != null) {
            extra.put(key, value);
        }
        SparkSession spark = SparkSession.active();
        org.apache.spark.sql.DataFrameReader reader =
                spark.read().format("paimon").options(extra);
        Dataset<Row> df = reader.load();
        // the analyzed plan's single leaf is the DataSourceV2Relation
        // Spark built for the registered Python data source; its Table
        // carries schema + scan builder + pushdown -- reuse it verbatim,
        // wrapped so WRITE builders also receive the path (Spark
        // constructs a fresh python source for writes from the write
        // info's options, which would otherwise be empty)
        scala.collection.Iterator<LogicalPlan> leaves =
                df.queryExecution().analyzed().collectLeaves().iterator();
        while (leaves.hasNext()) {
            LogicalPlan leaf = leaves.next();
            if (leaf instanceof DataSourceV2Relation) {
                return new OptionsTable(
                        ((DataSourceV2Relation) leaf).table(), extra,
                        TableMeta.read(tableDir(ident)));
            }
        }
        throw new IllegalStateException(
                "format(\"paimon\") did not resolve to a DSv2 relation -- "
                        + "call incubator_paimon_spark.datasource.register("
                        + "spark) before using the SQL catalog");
    }

    /**
     * Bucket layout of a table, parsed from its latest schema-N JSON (the
     * same contract the Python SchemaManager writes): the catalog needs it
     * to request the write distribution. The reference's Spark writer does
     * the equivalent repartition itself (PaimonSparkWriter.scala:322-325);
     * in DSv2 the table REQUESTS clustering and Spark plans the shuffle.
     */
    static final class TableMeta {
        final int numBuckets;
        final String[] clusterKeys; // bucket-key cols (trimmed PK default)
        final String[] orderKeys;   // partition cols + trimmed PK cols

        private TableMeta(int numBuckets, String[] clusterKeys,
                          String[] orderKeys) {
            this.numBuckets = numBuckets;
            this.clusterKeys = clusterKeys;
            this.orderKeys = orderKeys;
        }

        static TableMeta read(File tableDir) {
            try {
                File sd = new File(tableDir, "schema");
                File best = null;
                long bestId = -1;
                File[] children = sd.listFiles();
                if (children != null) {
                    for (File f : children) {
                        String n = f.getName();
                        if (n.startsWith("schema-")) {
                            try {
                                long id = Long.parseLong(n.substring(7));
                                if (id > bestId) {
                                    bestId = id;
                                    best = f;
                                }
                            } catch (NumberFormatException ignored) {
                            }
                        }
                    }
                }
                if (best == null) {
                    return null;
                }
                JsonNode node = new ObjectMapper().readTree(best);
                List<String> pks = strings(node.path("primaryKeys"));
                List<String> parts = strings(node.path("partitionKeys"));
                JsonNode opts = node.path("options");
                int bucket = Integer.parseInt(
                        opts.path("bucket").asText("-1"));
                List<String> cluster = new ArrayList<>();
                String bk = opts.path("bucket-key").asText("");
                if (!bk.isEmpty()) {
                    for (String k : bk.split(",")) {
                        cluster.add(k.trim());
                    }
                }
                List<String> trimmed = new ArrayList<>(pks);
                trimmed.removeAll(parts);
                if (trimmed.isEmpty()) {
                    trimmed = pks; // TableSchema.trimmedPrimaryKeys fallback
                }
                if (cluster.isEmpty()) {
                    cluster = trimmed;
                }
                List<String> order = new ArrayList<>(parts);
                order.addAll(trimmed);
                return new TableMeta(bucket,
                        cluster.toArray(new String[0]),
                        order.toArray(new String[0]));
            } catch (Exception e) {
                return null; // unreadable schema: no distribution request
            }
        }

        private static List<String> strings(JsonNode arr) {
            List<String> out = new ArrayList<>();
            for (JsonNode n : arr) {
                out.add(n.asText());
            }
            return out;
        }
    }

    /**
     * Delegates to the python source's Table while pinning the catalog's
     * options (path + time travel) into every scan/write builder.
     */
    private static final class OptionsTable
            implements Table,
                    org.apache.spark.sql.connector.catalog.SupportsRead,
                    org.apache.spark.sql.connector.catalog.SupportsWrite {

        private final Table inner;
        private final Map<String, String> extra;
        private final TableMeta meta;

        OptionsTable(Table inner, Map<String, String> extra, TableMeta meta) {
            this.inner = inner;
            this.extra = extra;
            this.meta = meta;
        }

        private CaseInsensitiveStringMap merged(CaseInsensitiveStringMap o) {
            java.util.HashMap<String, String> m =
                    new java.util.HashMap<>(o.asCaseSensitiveMap());
            m.putAll(extra);
            return new CaseInsensitiveStringMap(m);
        }

        @Override
        public String name() {
            return inner.name();
        }

        @Override
        @SuppressWarnings("deprecation")
        public StructType schema() {
            return inner.schema();
        }

        @Override
        public java.util.Set<org.apache.spark.sql.connector.catalog.TableCapability>
                capabilities() {
            return inner.capabilities();
        }

        @Override
        public Transform[] partitioning() {
            return inner.partitioning();
        }

        @Override
        public Map<String, String> properties() {
            return inner.properties();
        }

        @Override
        public org.apache.spark.sql.connector.read.ScanBuilder newScanBuilder(
                CaseInsensitiveStringMap options) {
            return ((org.apache.spark.sql.connector.catalog.SupportsRead) inner)
                    .newScanBuilder(merged(options));
        }

        @Override
        public org.apache.spark.sql.connector.write.WriteBuilder newWriteBuilder(
                org.apache.spark.sql.connector.write.LogicalWriteInfo info) {
            final CaseInsensitiveStringMap opts = merged(info.options());
            org.apache.spark.sql.connector.write.LogicalWriteInfo pinned =
                    new org.apache.spark.sql.connector.write.LogicalWriteInfo() {
                        @Override
                        public CaseInsensitiveStringMap options() {
                            return opts;
                        }

                        @Override
                        public String queryId() {
                            return info.queryId();
                        }

                        @Override
                        public StructType schema() {
                            return info.schema();
                        }
                    };
            org.apache.spark.sql.connector.write.WriteBuilder wb =
                    ((org.apache.spark.sql.connector.catalog.SupportsWrite) inner)
                            .newWriteBuilder(pinned);
            if (meta != null && meta.numBuckets > 0
                    && meta.clusterKeys.length > 0) {
                // fixed-bucket table: request clustering by the bucket-key
                // columns with EXACTLY numBuckets partitions. Spark plans
                // the shuffle as pmod(murmur3(keys), numBuckets) -- the
                // engine's own bucket function (write.bucket_expr) -- so
                // each writer task receives one complete bucket and the
                // Python writer emits one level-0 file per bucket. Same
                // net layout as the reference's explicit
                // repartition(partitionCols, bucket)
                // (PaimonSparkWriter.scala:322-325).
                return new BucketedWriteBuilder(wb, meta);
            }
            return wb;
        }
    }

    private static final class BucketedWriteBuilder
            implements org.apache.spark.sql.connector.write.WriteBuilder,
                    org.apache.spark.sql.connector.write.SupportsTruncate {

        private org.apache.spark.sql.connector.write.WriteBuilder inner;
        private final TableMeta meta;

        BucketedWriteBuilder(
                org.apache.spark.sql.connector.write.WriteBuilder inner,
                TableMeta meta) {
            this.inner = inner;
            this.meta = meta;
        }

        @Override
        public org.apache.spark.sql.connector.write.WriteBuilder truncate() {
            // mirror PythonWriteBuilder's own surface (WriteBuilder +
            // SupportsTruncate): INSERT OVERWRITE flows through here
            inner = ((org.apache.spark.sql.connector.write.SupportsTruncate)
                    inner).truncate();
            return this;
        }

        @Override
        public org.apache.spark.sql.connector.write.Write build() {
            return new BucketedWrite(inner.build(), meta);
        }
    }

    private static final class BucketedWrite
            implements org.apache.spark.sql.connector.write.Write,
                    org.apache.spark.sql.connector.write
                            .RequiresDistributionAndOrdering {

        private final org.apache.spark.sql.connector.write.Write inner;
        private final TableMeta meta;

        BucketedWrite(org.apache.spark.sql.connector.write.Write inner,
                      TableMeta meta) {
            this.inner = inner;
            this.meta = meta;
        }

        @Override
        public org.apache.spark.sql.connector.distributions.Distribution
                requiredDistribution() {
            org.apache.spark.sql.connector.expressions.Expression[] cluster =
                    new org.apache.spark.sql.connector.expressions
                            .Expression[meta.clusterKeys.length];
            for (int i = 0; i < meta.clusterKeys.length; i++) {
                cluster[i] = org.apache.spark.sql.connector.expressions
                        .Expressions.column(meta.clusterKeys[i]);
            }
            return org.apache.spark.sql.connector.distributions.Distributions
                    .clustered(cluster);
        }

        @Override
        public int requiredNumPartitions() {
            return meta.numBuckets;
        }

        @Override
        public org.apache.spark.sql.connector.expressions.SortOrder[]
                requiredOrdering() {
            // task-local sort by (partition cols, key cols): groups arrive
            // contiguous and near-sorted, so the writer's per-file
            // key+sequence sort is a cheap pass over mostly-ordered data
            org.apache.spark.sql.connector.expressions.SortOrder[] order =
                    new org.apache.spark.sql.connector.expressions
                            .SortOrder[meta.orderKeys.length];
            for (int i = 0; i < meta.orderKeys.length; i++) {
                order[i] = org.apache.spark.sql.connector.expressions
                        .Expressions.sort(
                                org.apache.spark.sql.connector.expressions
                                        .Expressions.column(meta.orderKeys[i]),
                                org.apache.spark.sql.connector.expressions
                                        .SortDirection.ASCENDING);
            }
            return order;
        }

        @Override
        public org.apache.spark.sql.connector.write.BatchWrite toBatch() {
            return inner.toBatch();
        }

        @Override
        public org.apache.spark.sql.connector.write.streaming.StreamingWrite
                toStreaming() {
            return inner.toStreaming();
        }

        @Override
        public String description() {
            return inner.description();
        }
    }

    @Override
    public boolean tableExists(Identifier ident) {
        return ident.namespace().length == 1 && isTableDir(tableDir(ident));
    }

    private static UnsupportedOperationException pythonDdl(String op) {
        return new UnsupportedOperationException(
                op + " is served by the Python API (incubator_paimon_spark"
                        + ".Catalog / catalog.sql) -- this SQL catalog is the "
                        + "read-path name resolver");
    }

    @Override
    public Table createTable(
            Identifier ident,
            StructType schema,
            Transform[] partitions,
            Map<String, String> properties)
            throws TableAlreadyExistsException, NoSuchNamespaceException {
        throw pythonDdl("CREATE TABLE");
    }

    @Override
    public Table alterTable(Identifier ident, TableChange... changes)
            throws NoSuchTableException {
        throw pythonDdl("ALTER TABLE");
    }

    @Override
    public boolean dropTable(Identifier ident) {
        throw pythonDdl("DROP TABLE");
    }

    @Override
    public void renameTable(Identifier oldIdent, Identifier newIdent)
            throws NoSuchTableException, TableAlreadyExistsException {
        throw pythonDdl("RENAME TABLE");
    }

    // ------------------------------------------------------------------
    // namespaces
    @Override
    public String[][] listNamespaces() {
        List<String[]> out = new ArrayList<>();
        File[] children = new File(warehouse).listFiles();
        if (children != null) {
            for (File c : children) {
                if (c.isDirectory() && c.getName().endsWith(".db")) {
                    String db = c.getName();
                    out.add(new String[] {db.substring(0, db.length() - 3)});
                }
            }
        }
        Collections.sort(out, (a, b) -> a[0].compareTo(b[0]));
        return out.toArray(new String[0][]);
    }

    @Override
    public String[][] listNamespaces(String[] namespace)
            throws NoSuchNamespaceException {
        if (namespace.length == 0) {
            return listNamespaces();
        }
        if (namespaceExists(namespace)) {
            return new String[0][];
        }
        throw new NoSuchNamespaceException(namespace);
    }

    @Override
    public boolean namespaceExists(String[] namespace) {
        return namespace.length == 1 && dbDir(namespace[0]).isDirectory();
    }

    @Override
    public Map<String, String> loadNamespaceMetadata(String[] namespace)
            throws NoSuchNamespaceException {
        if (!namespaceExists(namespace)) {
            throw new NoSuchNamespaceException(namespace);
        }
        return Collections.emptyMap();
    }

    @Override
    public void createNamespace(String[] namespace, Map<String, String> metadata)
            throws NamespaceAlreadyExistsException {
        throw pythonDdl("CREATE NAMESPACE");
    }

    @Override
    public void alterNamespace(String[] namespace, NamespaceChange... changes)
            throws NoSuchNamespaceException {
        throw pythonDdl("ALTER NAMESPACE");
    }

    @Override
    public boolean dropNamespace(String[] namespace, boolean cascade)
            throws NoSuchNamespaceException, NonEmptyNamespaceException {
        throw pythonDdl("DROP NAMESPACE");
    }
}
