/*
 * Session-extension analyzer rule: row-level SQL (DELETE FROM / UPDATE /
 * MERGE INTO) against native-catalog identifiers.
 *
 * The reference wires these through injected catalyst rules
 * (paimon-spark/.../catalyst/analysis/PaimonDeleteTable.scala,
 * PaimonUpdateTable.scala, PaimonMergeIntoBase.scala) that rewrite the
 * command into its JVM core's row-level ops. Here the core is Python
 * (row_ops.py — oracle-green for all three verbs), so the rule routes
 * the ORIGINAL STATEMENT TEXT (Origin.sqlText, attached by Spark's
 * parser to every top-level command) over the PaimonPyBridge to
 * sql.execute_sql, which re-parses and executes through the proven
 * engine paths. The command node is then replaced with an empty
 * LocalRelation — same user-visible contract as Spark's own eagerly
 * executed commands (0 rows, side effect done when spark.sql returns).
 *
 * The rule fires only when the target table's catalog is a
 * PaimonSparkCatalog (checked pre-resolution via the multipart name's
 * catalog conf, or post-resolution via DataSourceV2Relation.catalog),
 * so every other table keeps Spark's stock behavior. Documented edge:
 * EXPLAIN of one of these statements executes it (analysis-time
 * execution, the same tradeoff as the Python catalog.sql rewriter).
 *
 * Install: PaimonSqlExtensions.install(session) injects the rule into
 * the session's SparkSessionExtensions; a cloneSession picks it up
 * (SessionState rebuilds its analyzer from the shared extensions).
 * Fresh sessions can instead set spark.sql.extensions=
 * org.apache.paimon.pyspark.PaimonSqlExtensions with the jar on the
 * classpath — this class doubles as the extensions entry point.
 */
package org.apache.paimon.pyspark;

import org.apache.spark.sql.SparkSession;
import org.apache.spark.sql.SparkSessionExtensions;
import org.apache.spark.sql.catalyst.analysis.UnresolvedRelation;
import org.apache.spark.sql.catalyst.plans.logical.DeleteFromTable;
import org.apache.spark.sql.catalyst.plans.logical.LocalRelation;
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan;
import org.apache.spark.sql.catalyst.plans.logical.MergeIntoTable;
import org.apache.spark.sql.catalyst.plans.logical.SubqueryAlias;
import org.apache.spark.sql.catalyst.plans.logical.UpdateTable;
import org.apache.spark.sql.catalyst.rules.Rule;
import org.apache.spark.sql.connector.catalog.CatalogPlugin;
import org.apache.spark.sql.execution.datasources.v2.DataSourceV2Relation;

public class PaimonSqlExtensions
        extends scala.runtime.AbstractFunction1<SparkSessionExtensions,
                scala.runtime.BoxedUnit> {

    /** spark.sql.extensions entry point (fresh sessions). */
    @Override
    public scala.runtime.BoxedUnit apply(SparkSessionExtensions ext) {
        inject(ext);
        return scala.runtime.BoxedUnit.UNIT;
    }

    private static final java.util.Set<SparkSessionExtensions> INSTALLED =
            java.util.Collections.newSetFromMap(
                    new java.util.WeakHashMap<>());

    public static synchronized void inject(SparkSessionExtensions ext) {
        if (!INSTALLED.add(ext)) {
            return; // idempotent across repeated installs
        }
        ext.injectResolutionRule(new RuleBuilder());
    }

    /** Live-session install: mutate the session's extensions, then have
     * the caller cloneSession() so the rebuilt analyzer picks the rule
     * up (extensions are read when a SessionState is built). */
    public static void install(SparkSession session) {
        inject(((org.apache.spark.sql.classic.SparkSession) session)
                .extensions());
    }

    public static final class RuleBuilder
            extends scala.runtime.AbstractFunction1<SparkSession,
                    Rule<LogicalPlan>> implements java.io.Serializable {
        @Override
        public Rule<LogicalPlan> apply(SparkSession session) {
            return new RowLevelSqlRule(
                    (org.apache.spark.sql.classic.SparkSession) session);
        }
    }

    public static final class RowLevelSqlRule extends Rule<LogicalPlan> {

        private final org.apache.spark.sql.classic.SparkSession session;

        RowLevelSqlRule(org.apache.spark.sql.classic.SparkSession session) {
            this.session = session;
        }

        @Override
        public String ruleName() {
            return "PaimonRowLevelSql";
        }

        @Override
        public LogicalPlan apply(LogicalPlan plan) {
            LogicalPlan target;
            if (plan instanceof DeleteFromTable) {
                target = ((DeleteFromTable) plan).table();
            } else if (plan instanceof UpdateTable) {
                target = ((UpdateTable) plan).table();
            } else if (plan instanceof MergeIntoTable) {
                target = ((MergeIntoTable) plan).targetTable();
            } else {
                return plan;
            }
            String[] catWh = paimonCatalogOf(target);
            if (catWh == null) {
                return plan;
            }
            scala.Option<String> text = plan.origin().sqlText();
            if (text.isEmpty()) {
                throw new UnsupportedOperationException(
                        "row-level command reached the Paimon rule without "
                                + "its original SQL text (programmatic plan"
                                + "?) — use the Python API (Table.delete_"
                                + "where/update_where/merge_into) instead");
            }
            PaimonPyBridge.call("sql", text.get(), catWh[0], catWh[1],
                    session);
            return emptyRelation();
        }

        /** {catalogName, warehouse} when the (possibly aliased,
         * possibly still unresolved) target belongs to a
         * PaimonSparkCatalog; null otherwise. */
        private String[] paimonCatalogOf(LogicalPlan target) {
            while (target instanceof SubqueryAlias) {
                target = ((SubqueryAlias) target).child();
            }
            if (target instanceof UnresolvedRelation) {
                scala.collection.immutable.Seq<String> parts =
                        ((UnresolvedRelation) target).multipartIdentifier();
                String catName;
                String db;
                String tbl;
                if (parts.size() == 3) {
                    catName = parts.apply(0);
                    db = parts.apply(1);
                    tbl = parts.apply(2);
                } else if (parts.size() == 2) {
                    catName = session.sessionState().catalogManager()
                            .currentCatalog().name();
                    db = parts.apply(0);
                    tbl = parts.apply(1);
                } else {
                    return null; // 1-part names: temp views / USE <db>
                }
                String impl = session.sessionState().conf().getConfString(
                        "spark.sql.catalog." + catName, "");
                if (!PaimonSparkCatalog.class.getName().equals(impl)
                        && !PaimonSparkGenericCatalog.class.getName()
                                .equals(impl)) {
                    return null;
                }
                String wh = session.sessionState().conf().getConfString(
                        "spark.sql.catalog." + catName + ".warehouse", "");
                // only hijack identifiers that ARE warehouse tables: a
                // generic spark_catalog serves plain session-catalog
                // tables too, and those must keep Spark's own behavior
                // (and its own errors for missing tables)
                int i = tbl.indexOf("$branch_");
                String base = i > 0 ? tbl.substring(0, i) : tbl;
                if (!new java.io.File(new java.io.File(wh, db + ".db"),
                        base + "/schema").isDirectory()) {
                    return null;
                }
                return new String[] {catName, wh};
            }
            if (target instanceof DataSourceV2Relation) {
                DataSourceV2Relation rel = (DataSourceV2Relation) target;
                if (rel.catalog().isDefined()
                        && rel.catalog().get() instanceof PaimonSparkCatalog) {
                    CatalogPlugin cat = rel.catalog().get();
                    return new String[] {cat.name(),
                            ((PaimonSparkCatalog) cat).warehouse()};
                }
            }
            return null;
        }

        @SuppressWarnings("unchecked")
        private static LogicalPlan emptyRelation() {
            return new LocalRelation(
                    (scala.collection.immutable.Seq<
                            org.apache.spark.sql.catalyst.expressions
                                    .Attribute>)
                            (scala.collection.immutable.Seq<?>)
                                    scala.collection.immutable.Nil$.MODULE$,
                    (scala.collection.immutable.Seq<
                            org.apache.spark.sql.catalyst.InternalRow>)
                            (scala.collection.immutable.Seq<?>)
                                    scala.collection.immutable.Nil$.MODULE$,
                    false,
                    scala.Option.empty());
        }
    }
}
