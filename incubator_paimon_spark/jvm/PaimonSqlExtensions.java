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
 * so every other table keeps Spark's stock behavior. EXPLAIN of one of
 * these statements NEVER executes it: the rule sees the wrapper's full
 * original text ("EXPLAIN UPDATE ..."), detects the EXPLAIN head, and
 * raises a pointed planning-time error instead of forwarding — pinned
 * by test_explain_row_level_sql_does_not_execute.
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
            if (isExplainWrapped(text.get())) {
                // EXPLAIN re-analyzes its child with the DML at the
                // root but Origin.sqlText still carries the WHOLE
                // "EXPLAIN UPDATE ..." statement — never execute during
                // someone's plan inspection; fail with a pointed
                // message instead of a parser traceback
                throw new UnsupportedOperationException(
                        "EXPLAIN of a Paimon row-level command does not "
                                + "execute it and its plan is not "
                                + "renderable here — run the statement "
                                + "directly (it executes as one "
                                + "predicate-pruned read plus a bucketed "
                                + "write+commit)");
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
                boolean generic = PaimonSparkGenericCatalog.class.getName()
                        .equals(impl);
                if (!PaimonSparkCatalog.class.getName().equals(impl)
                        && !generic) {
                    return null;
                }
                String wh = session.sessionState().conf().getConfString(
                        "spark.sql.catalog." + catName + ".warehouse", "");
                if (!generic) {
                    // a dedicated Paimon catalog serves ONLY warehouse
                    // tables, so the conf match is sufficient — no
                    // filesystem probe, which would never match a remote
                    // warehouse URI (s3://, hdfs://) and silently dropped
                    // UPDATE/MERGE to Spark's stock unsupported path
                    return new String[] {catName, wh};
                }
                // generic spark_catalog serves plain session-catalog
                // tables too, and those must keep Spark's own behavior
                // (and its own errors for missing tables): hijack only
                // identifiers that ARE warehouse tables
                int i = tbl.indexOf("$branch_");
                String base = i > 0 ? tbl.substring(0, i) : tbl;
                if (isLocalPath(wh)) {
                    if (!new java.io.File(new java.io.File(
                                    localFile(wh), db + ".db"),
                            base + "/schema").isDirectory()) {
                        return null;
                    }
                    return new String[] {catName, wh};
                }
                // remote warehouse: delegate existence to the engine's
                // FileIO over the bridge (pyarrow.fs serves s3/gs/hdfs);
                // a bridge failure falls through to Spark's stock path,
                // whose unsupported-operation error is still loud
                try {
                    Object r = PaimonPyBridge.call(
                            "is_warehouse_table", wh, db, base);
                    if ("true".equals(r)) {
                        return new String[] {catName, wh};
                    }
                } catch (RuntimeException ignored) {
                    // fall through
                }
                return null;
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

        /** Leading-whitespace/comment-tolerant check that the original
         * statement is an EXPLAIN wrapper around the DML node the
         * analyzer handed us. */
        static boolean isExplainWrapped(String sql) {
            int i = 0;
            int n = sql.length();
            while (i < n) {
                char c = sql.charAt(i);
                if (Character.isWhitespace(c)) {
                    i++;
                } else if (c == '-' && i + 1 < n && sql.charAt(i + 1) == '-') {
                    int nl = sql.indexOf('\n', i);
                    i = nl < 0 ? n : nl + 1;
                } else if (c == '/' && i + 1 < n && sql.charAt(i + 1) == '*') {
                    int end = sql.indexOf("*/", i + 2);
                    i = end < 0 ? n : end + 2;
                } else {
                    break;
                }
            }
            return sql.regionMatches(true, i, "explain", 0, 7)
                    && (i + 7 == n
                            || !Character.isLetterOrDigit(sql.charAt(i + 7)));
        }

        private static boolean isLocalPath(String wh) {
            return !wh.contains("://") || wh.startsWith("file:");
        }

        private static java.io.File localFile(String wh) {
            return new java.io.File(wh.startsWith("file:")
                    ? java.net.URI.create(wh.replace(" ", "%20")).getPath()
                    : wh);
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
