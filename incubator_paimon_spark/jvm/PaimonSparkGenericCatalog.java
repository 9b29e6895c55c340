/*
 * A CatalogExtension so `spark_catalog` ITSELF can be Paimon-aware
 * (the reference's SparkGenericCatalog surface:
 * paimon-spark/paimon-spark-common/.../SparkGenericCatalog.java:79):
 * identifiers that resolve to a table dir under the configured
 * warehouse are served by the Paimon engine (PaimonSparkCatalog);
 * everything else falls through to Spark's built-in session catalog,
 * so one `spark.sql` statement can mix Paimon tables with plain
 * parquet/Hive tables without naming a secondary catalog.
 *
 * Usage:
 *   spark.sql.catalog.spark_catalog = org.apache.paimon.pyspark
 *       .PaimonSparkGenericCatalog
 *   spark.sql.catalog.spark_catalog.warehouse = /path/to/warehouse
 * (install_generic_catalog(spark, warehouse) does both, but the
 * session-catalog plugin is read when a session's CatalogManager first
 * resolves spark_catalog, so set it on a FRESH session / newSession().)
 *
 * Routing rule: reads/alters/drops go to whichever side HAS the table;
 * CREATE TABLE goes to Paimon when `USING paimon` (or a primary-key
 * property) says so, to the session catalog otherwise. Namespace ops
 * delegate to the session catalog -- the warehouse's <db>.db dir is
 * created on demand by a Paimon CREATE TABLE -- and namespace listings
 * union both sides.
 */
package org.apache.paimon.pyspark;

import java.util.ArrayList;
import java.util.LinkedHashSet;
import java.util.List;
import java.util.Map;

import org.apache.spark.sql.catalyst.analysis.NamespaceAlreadyExistsException;
import org.apache.spark.sql.catalyst.analysis.NoSuchFunctionException;
import org.apache.spark.sql.catalyst.analysis.NoSuchNamespaceException;
import org.apache.spark.sql.catalyst.analysis.NoSuchTableException;
import org.apache.spark.sql.catalyst.analysis.NonEmptyNamespaceException;
import org.apache.spark.sql.catalyst.analysis.TableAlreadyExistsException;
import org.apache.spark.sql.connector.catalog.CatalogExtension;
import org.apache.spark.sql.connector.catalog.CatalogPlugin;
import org.apache.spark.sql.connector.catalog.FunctionCatalog;
import org.apache.spark.sql.connector.catalog.Identifier;
import org.apache.spark.sql.connector.catalog.NamespaceChange;
import org.apache.spark.sql.connector.catalog.SupportsNamespaces;
import org.apache.spark.sql.connector.catalog.Table;
import org.apache.spark.sql.connector.catalog.TableCatalog;
import org.apache.spark.sql.connector.catalog.TableChange;
import org.apache.spark.sql.connector.catalog.functions.UnboundFunction;
import org.apache.spark.sql.connector.expressions.Transform;
import org.apache.spark.sql.types.StructType;

public class PaimonSparkGenericCatalog extends PaimonSparkCatalog
        implements CatalogExtension {

    private CatalogPlugin delegate;

    @Override
    public void setDelegateCatalog(CatalogPlugin delegate) {
        this.delegate = delegate;
    }

    private TableCatalog tables() {
        if (delegate == null) {
            throw new IllegalStateException(
                    "session catalog delegate not set -- use this class as "
                            + "spark.sql.catalog.spark_catalog only");
        }
        return (TableCatalog) delegate;
    }

    private SupportsNamespaces namespaces() {
        return (SupportsNamespaces) tables();
    }

    private boolean isPaimon(Identifier ident) {
        return ident.namespace().length == 1
                && isTableDir(tableDir(ident));
    }

    @Override
    public String[] defaultNamespace() {
        return delegate == null ? new String[0] : delegate.defaultNamespace();
    }

    // ------------------------------------------------------------------
    // tables
    @Override
    public Identifier[] listTables(String[] namespace)
            throws NoSuchNamespaceException {
        LinkedHashSet<String> names = new LinkedHashSet<>();
        List<Identifier> out = new ArrayList<>();
        boolean any = false;
        if (namespace.length == 1 && dbDir(namespace[0]).isDirectory()) {
            any = true;
            for (Identifier id : super.listTables(namespace)) {
                if (names.add(id.name())) {
                    out.add(id);
                }
            }
        }
        try {
            for (Identifier id : tables().listTables(namespace)) {
                if (names.add(id.name())) {
                    out.add(id);
                }
            }
            any = true;
        } catch (NoSuchNamespaceException e) {
            if (!any) {
                throw e;
            }
        }
        return out.toArray(new Identifier[0]);
    }

    @Override
    public Table loadTable(Identifier ident) throws NoSuchTableException {
        if (isPaimon(ident)) {
            return super.loadTable(ident);
        }
        return tables().loadTable(ident);
    }

    @Override
    public Table loadTable(Identifier ident, String version)
            throws NoSuchTableException {
        if (isPaimon(ident)) {
            return super.loadTable(ident, version);
        }
        return tables().loadTable(ident, version);
    }

    @Override
    public Table loadTable(Identifier ident, long timestampMicros)
            throws NoSuchTableException {
        if (isPaimon(ident)) {
            return super.loadTable(ident, timestampMicros);
        }
        return tables().loadTable(ident, timestampMicros);
    }

    @Override
    public boolean tableExists(Identifier ident) {
        return isPaimon(ident) || tables().tableExists(ident);
    }

    @Override
    public Table createTable(
            Identifier ident,
            StructType schema,
            Transform[] partitions,
            Map<String, String> properties)
            throws TableAlreadyExistsException, NoSuchNamespaceException {
        String provider = properties.get("provider");
        boolean paimon = "paimon".equalsIgnoreCase(provider)
                || properties.containsKey("primary-key");
        if (!paimon) {
            return tables().createTable(ident, schema, partitions,
                    properties);
        }
        if (ident.namespace().length == 1
                && !dbDir(ident.namespace()[0]).isDirectory()
                && namespaces().namespaceExists(ident.namespace())) {
            // the namespace lives in the session catalog; materialize its
            // warehouse dir so the Paimon table has a home
            dbDir(ident.namespace()[0]).mkdirs();
        }
        return super.createTable(ident, schema, partitions, properties);
    }

    @Override
    public Table alterTable(Identifier ident, TableChange... changes)
            throws NoSuchTableException {
        if (isPaimon(ident)) {
            return super.alterTable(ident, changes);
        }
        return tables().alterTable(ident, changes);
    }

    @Override
    public boolean dropTable(Identifier ident) {
        if (isPaimon(ident)) {
            return super.dropTable(ident);
        }
        return tables().dropTable(ident);
    }

    @Override
    public void renameTable(Identifier oldIdent, Identifier newIdent)
            throws NoSuchTableException, TableAlreadyExistsException {
        if (isPaimon(oldIdent)) {
            super.renameTable(oldIdent, newIdent);
            return;
        }
        tables().renameTable(oldIdent, newIdent);
    }

    @Override
    public void invalidateTable(Identifier ident) {
        if (!isPaimon(ident)) {
            tables().invalidateTable(ident);
        }
    }

    // ------------------------------------------------------------------
    // namespaces: the session catalog owns them; listings union the
    // warehouse's <db>.db dirs so SHOW NAMESPACES sees both sides
    @Override
    public String[][] listNamespaces() {
        LinkedHashSet<String> seen = new LinkedHashSet<>();
        List<String[]> out = new ArrayList<>();
        for (String[] ns : super.listNamespaces()) {
            if (seen.add(String.join(".", ns))) {
                out.add(ns);
            }
        }
        try {
            for (String[] ns : namespaces().listNamespaces()) {
                if (seen.add(String.join(".", ns))) {
                    out.add(ns);
                }
            }
        } catch (Exception ignored) {
        }
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
        return super.namespaceExists(namespace)
                || namespaces().namespaceExists(namespace);
    }

    @Override
    public Map<String, String> loadNamespaceMetadata(String[] namespace)
            throws NoSuchNamespaceException {
        if (namespaces().namespaceExists(namespace)) {
            return namespaces().loadNamespaceMetadata(namespace);
        }
        return super.loadNamespaceMetadata(namespace);
    }

    @Override
    public void createNamespace(String[] namespace, Map<String, String> metadata)
            throws NamespaceAlreadyExistsException {
        namespaces().createNamespace(namespace, metadata);
    }

    @Override
    public void alterNamespace(String[] namespace, NamespaceChange... changes)
            throws NoSuchNamespaceException {
        namespaces().alterNamespace(namespace, changes);
    }

    @Override
    public boolean dropNamespace(String[] namespace, boolean cascade)
            throws NoSuchNamespaceException, NonEmptyNamespaceException {
        boolean dropped = false;
        if (super.namespaceExists(namespace)) {
            dropped = super.dropNamespace(namespace, cascade);
        }
        if (namespaces().namespaceExists(namespace)) {
            dropped = namespaces().dropNamespace(namespace, cascade)
                    || dropped;
        }
        return dropped;
    }

    // ------------------------------------------------------------------
    // functions: pure delegation (the Paimon side defines none)
    @Override
    public Identifier[] listFunctions(String[] namespace)
            throws NoSuchNamespaceException {
        return ((FunctionCatalog) tables()).listFunctions(namespace);
    }

    @Override
    public UnboundFunction loadFunction(Identifier ident)
            throws NoSuchFunctionException {
        return ((FunctionCatalog) tables()).loadFunction(ident);
    }
}
