package graft;

import org.apache.spark.sql.SparkSession;
import org.apache.spark.sql.catalyst.expressions.Expression;
import org.apache.spark.sql.catalyst.plans.logical.Filter;
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan;
import org.apache.spark.sql.catalyst.rules.Rule;
import org.apache.spark.sql.catalyst.trees.TreeNodeTag;
import org.apache.spark.sql.execution.datasources.HadoopFsRelation;
import org.apache.spark.sql.execution.datasources.LogicalRelation;
import org.apache.spark.sql.execution.datasources.v2.DataSourceV2Relation;
import org.apache.spark.sql.execution.datasources.v2.FileTable;
import org.apache.spark.sql.execution.streaming.runtime.StreamingRelation;
import scala.runtime.AbstractPartialFunction;

/**
 * Plan-level partition-ACL enforcement (SURVEY section 4, design 2).
 *
 * A resolution rule that wraps every file-source relation whose root path is
 * registered in {@code spark.graft.acl.rules} with a Filter on the compiled
 * DNF predicate. Unlike the library-level Engine.read_table() filter, this
 * covers the raw DataFrame path: {@code spark.read.parquet(governed_path)} in
 * an extension-enabled session carries the ACL whether or not the caller went
 * through the Engine (the reference enforces the same invariant with a
 * process boundary, src/main.rs:576-594).
 *
 * SCOPE OF THE GUARANTEE: this is plan-level enforcement for Catalyst file
 * relations inside sessions built with the extension confs. It is NOT a
 * security boundary against code running in the same process: RDD-level
 * reads (sparkContext.textFile/hadoopFile) never enter Catalyst, and a caller
 * can always build a separate session without the extension. The rules
 * string is snapshotted at session creation, so in-session
 * {@code spark.conf.set("spark.graft.acl.rules", ...)} mutation cannot
 * clear or alter enforcement.
 *
 * Conf format (set by delta_lake_proxy_spark.acl.extension_confs):
 *   spark.graft.acl.rules = <path>\t<predicate sql>\n<path>\t<predicate sql>...
 *
 * The predicate SQL is parsed unresolved and resolved by the analyzer's
 * fixed point against the relation's own output; a TreeNodeTag prevents
 * re-injection on later passes. Matches both V1 file relations
 * (LogicalRelation over HadoopFsRelation, the default for parquet/orc/csv)
 * and V2 (DataSourceV2Relation over a FileTable, e.g. when
 * spark.sql.sources.useV1SourceList excludes the format).
 */
public class GovernedAclRule extends Rule<LogicalPlan> {
  private static final TreeNodeTag<Boolean> INJECTED =
      new TreeNodeTag<>("graft.acl.injected");

  private final SparkSession session;
  private final String rules;

  public GovernedAclRule(SparkSession session) {
    this.session = session;
    // Snapshot at rule construction (session creation): the extension confs
    // are static, and reading the mutable RuntimeConfig on every analyzer
    // pass would let any in-session conf.set() disable enforcement.
    this.rules = session.conf().get("spark.graft.acl.rules", "");
  }

  private String normalize(String p) {
    // compare on the filesystem path, ignoring scheme and trailing slash
    String s = p;
    int scheme = s.indexOf(":/");
    if (s.startsWith("file:")) {
      s = s.substring(5);
    } else if (scheme > 0 && scheme < 8) {
      s = s.substring(scheme + 1);
    }
    while (s.startsWith("//")) {
      s = s.substring(1);
    }
    if (s.endsWith("/") && s.length() > 1) {
      s = s.substring(0, s.length() - 1);
    }
    return s;
  }

  /** Root paths for V1 (LogicalRelation/HadoopFsRelation), V2
   * (DataSourceV2Relation/FileTable), and streaming (StreamingRelation,
   * i.e. {@code spark.readStream.parquet(path)}) file relations; null otherwise. */
  private scala.collection.Iterator<org.apache.hadoop.fs.Path> rootPaths(LogicalPlan p) {
    if (p instanceof LogicalRelation
        && ((LogicalRelation) p).relation() instanceof HadoopFsRelation) {
      return ((HadoopFsRelation) ((LogicalRelation) p).relation())
          .location()
          .rootPaths()
          .iterator();
    }
    if (p instanceof DataSourceV2Relation
        && ((DataSourceV2Relation) p).table() instanceof FileTable) {
      return ((FileTable) ((DataSourceV2Relation) p).table())
          .fileIndex()
          .rootPaths()
          .iterator();
    }
    if (p instanceof StreamingRelation) {
      // file-source streams carry their root as the "path" option; the
      // injected Filter stays in the logical plan and applies to every
      // micro-batch the stream plans from this relation
      scala.Option<String> path =
          ((StreamingRelation) p).dataSource().options().get("path");
      if (path.isDefined()) {
        java.util.List<org.apache.hadoop.fs.Path> one =
            java.util.Collections.singletonList(
                new org.apache.hadoop.fs.Path(path.get()));
        return scala.jdk.javaapi.CollectionConverters.asScala(one.iterator());
      }
    }
    return null;
  }

  private String predicateFor(LogicalPlan rel) {
    if (rules.isEmpty()) {
      return null;
    }
    scala.collection.Iterator<org.apache.hadoop.fs.Path> it = rootPaths(rel);
    if (it == null) {
      return null;
    }
    while (it.hasNext()) {
      String root = normalize(it.next().toString());
      for (String line : rules.split("\n")) {
        int tab = line.indexOf('\t');
        if (tab <= 0) {
          continue;
        }
        String govPath = normalize(line.substring(0, tab));
        if (root.equals(govPath) || root.startsWith(govPath + "/")) {
          return line.substring(tab + 1);
        }
      }
    }
    return null;
  }

  @Override
  public LogicalPlan apply(LogicalPlan plan) {
    return plan.resolveOperatorsUp(
        new AbstractPartialFunction<LogicalPlan, LogicalPlan>() {
          @Override
          public boolean isDefinedAt(LogicalPlan p) {
            return p.getTagValue(INJECTED).isEmpty() && predicateFor(p) != null;
          }

          @Override
          public LogicalPlan apply(LogicalPlan rel) {
            String sql = predicateFor(rel);
            rel.setTagValue(INJECTED, Boolean.TRUE);
            Expression cond;
            try {
              cond = session.sessionState().sqlParser().parseExpression(sql);
            } catch (org.apache.spark.sql.catalyst.parser.ParseException e) {
              // fail CLOSED: an unparseable ACL must never widen access
              throw new IllegalStateException(
                  "invalid spark.graft.acl.rules predicate: " + sql, e);
            }
            return new Filter(cond, rel);
          }
        });
  }
}
