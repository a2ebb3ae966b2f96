package pcsext;

import org.apache.spark.sql.SparkSession;
import org.apache.spark.sql.SparkSessionExtensions;
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan;
import org.apache.spark.sql.catalyst.rules.Rule;
import scala.Function1;
import scala.runtime.AbstractFunction1;
import scala.runtime.BoxedUnit;

/**
 * SparkSessionExtensions entry point: set
 * {@code spark.sql.extensions=pcsext.EngineExtensions} (with this jar on the
 * driver classpath) and every session picks up the engine's custom optimizer
 * rules. Injection happens once per session at getOrCreate; the injected
 * rule runs inside Catalyst's operatorOptimization batch alongside the
 * built-ins, so downstream batches (constant folding, filter pushdown) see
 * the simplified expression tree.
 */
public class EngineExtensions implements Function1<SparkSessionExtensions, BoxedUnit> {
  @Override
  public BoxedUnit apply(SparkSessionExtensions ext) {
    ext.injectOptimizerRule(
        new AbstractFunction1<SparkSession, Rule<LogicalPlan>>() {
          @Override
          public Rule<LogicalPlan> apply(SparkSession session) {
            return new CollapseRedundantCase();
          }
        });
    return BoxedUnit.UNIT;
  }
}
