package pcsext;

import org.apache.spark.sql.catalyst.expressions.Expression;
import org.apache.spark.sql.catalyst.expressions.Lower;
import org.apache.spark.sql.catalyst.expressions.Upper;
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan;
import org.apache.spark.sql.catalyst.rules.Rule;
import scala.runtime.AbstractPartialFunction;

/**
 * Catalyst optimizer rule: collapse idempotent case normalizations.
 *
 * upper(upper(e)) -&gt; upper(e) and lower(lower(e)) -&gt; lower(e).
 * These show up when layered views each defensively normalize a dedup or
 * join key (e.g. the q_dedup_exact normalization applied on top of an
 * already-normalized silver table); Catalyst's built-in batches do not
 * simplify them. Only the same-case compositions are folded: cross-case
 * pairs like lower(upper(e)) are NOT equivalent to lower(e) under full
 * Unicode case mapping (lower(upper("ß")) = "ss" but
 * lower("ß") = "ß"), so they are left untouched.
 *
 * Demonstrates the SparkSessionExtensions injection path (SURVEY.md section
 * 4.2 stretch): the reference has no optimizer to extend, so this is the
 * engine-side analogue of adding a rewrite to a query planner.
 */
public class CollapseRedundantCase extends Rule<LogicalPlan> {
  private static final AbstractPartialFunction<Expression, Expression> COLLAPSE =
      new AbstractPartialFunction<Expression, Expression>() {
        @Override
        public boolean isDefinedAt(Expression e) {
          return (e instanceof Upper && ((Upper) e).child() instanceof Upper)
              || (e instanceof Lower && ((Lower) e).child() instanceof Lower);
        }

        @Override
        public Expression apply(Expression e) {
          if (e instanceof Upper) {
            return ((Upper) e).child();
          }
          return ((Lower) e).child();
        }
      };

  @Override
  public LogicalPlan apply(LogicalPlan plan) {
    return (LogicalPlan) plan.transformAllExpressions(COLLAPSE);
  }
}
