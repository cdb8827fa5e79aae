package graft.expressions

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Optimizer rule rewriting the portable match-counting pattern
  * `size(regexp_extract_all(s, pattern, 0))` into the native
  * [[RegexpTally]]: both run the same `java.util.regex` find loop over
  * non-overlapping matches, but the portable form MATERIALIZES the
  * match array (one UTF8String per match) only to take its length —
  * on a PII-density scan that is gigabytes of throwaway allocations
  * per task. The rewrite drops the array entirely.
  *
  * Guards: the group index must be the literal 0 (full matches — the
  * array length for a group index counts the same matches, but only 0
  * is what the tally was validated against), the pattern a foldable
  * string literal (RegexpTally compiles once per plan), and
  * `legacySizeOfNull` must be off (legacy `size(null) = -1` differs
  * from the tally's null-propagating semantics).
  */
object RewriteRegexpCount extends Rule[LogicalPlan] {

  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.transformAllExpressions {
      case Size(RegExpExtractAll(s,
            Literal(p: UTF8String, StringType), Literal(0, IntegerType)),
          legacySizeOfNull)
        if !legacySizeOfNull =>
        RegexpTally(s, p.toString)
    }
}
