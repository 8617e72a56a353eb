package graft;

import org.apache.spark.sql.SparkSessionExtensions;
import scala.runtime.BoxedUnit;

/**
 * Entry point for {@code spark.sql.extensions}: injects
 * {@link GovernedAclRule} as an analyzer resolution rule.
 *
 * Usage (confs must be set before the first SparkSession is created):
 *   spark.jars          = .../graft-acl-ext.jar
 *   spark.sql.extensions = graft.GovernedAclExtension
 *   spark.graft.acl.rules = <path>\t<predicate sql>[\n...]
 */
public class GovernedAclExtension
    implements scala.Function1<SparkSessionExtensions, BoxedUnit> {

  @Override
  public BoxedUnit apply(SparkSessionExtensions extensions) {
    extensions.injectResolutionRule(GovernedAclRule::new);
    return BoxedUnit.UNIT;
  }
}
