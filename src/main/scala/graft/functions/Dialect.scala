package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.analysis.UnresolvedFunction
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.types._

/** The MultiSQL dialect function pack, registered into a session's
  * function registry so `spark.sql` text can call them directly.
  *
  * Implementation preference (SURVEY.md §4): compose existing Catalyst
  * expressions (stays in whole-stage codegen) > Scala UDF. Only the
  * MONEY thousands-formatter and calendar-clamped DATEADD are UDFs.
  *
  * Reference semantics implemented here:
  *  - CONVERT / TRY_CONVERT format-rule family
  *    (/root/reference/src/data/value/cast.rs:146-303,
  *    methods/function.rs:124-150): rule integers 020…101 are
  *    datetime parse formats, 'DATETIME'/'MONEY'/'SEPARATED' rules
  *    format numbers to text, named rules try format lists.
  *  - Permissive CAST (cast.rs:24-134): bool→1/0, f64→i64 truncates,
  *    NULL→'NULL' for text.
  *  - DATEADD with month-end clamping (methods/timestamp.rs:147-278),
  *    DATEFROMPARTS (timestamp.rs:279-314), NOW() as epoch seconds
  *    (timestamp.rs:103-115) — MultiSQL timestamps are epoch-second
  *    I64 values.
  *  - LEN = byte length (utility.rs:75-78), IIF (utility.rs:25-31),
  *    RAND(min,max) int range (function.rs:95-113), XOR
  *    (methods/binary.rs:102-106).
  * Documented divergences: Spark's string→bool accepts more spellings
  * than true/false; named-rule CONVERT misses return NULL rather than
  * erroring (TRY semantics); UUID() is correct here while the
  * reference's dispatch bug makes its UUID return a random float
  * (from/method.rs:45) — we implement the intent, not the bug.
  */
object Dialect {

  private def fn(name: String, args: Expression*): Expression =
    UnresolvedFunction(Seq(name), args.toSeq, isDistinct = false)

  private def tryCast(e: Expression, dt: DataType): Expression =
    Cast(e, dt, None, EvalMode.TRY)

  /** chrono strftime → java.time pattern. Letters outside % codes are
    * quoted so they stay literal in the java pattern. */
  def strftimeToJava(fmt: String): String = {
    val out = new StringBuilder
    var i = 0
    while (i < fmt.length) {
      val c = fmt(i)
      if (c == '%' && i + 1 < fmt.length) {
        val code = fmt(i + 1)
        out ++= (code match {
          case 'Y' => "yyyy"
          case 'y' => "yy"
          case 'm' => "MM"
          case 'd' => "dd"
          case 'e' => "d"
          case 'b' | 'h' => "MMM"
          case 'B' => "MMMM"
          case 'H' => "HH"
          case 'I' => "hh"
          case 'M' => "mm"
          case 'S' => "ss"
          case 'p' => "a"
          case 'F' => "yyyy-MM-dd"
          case 'T' => "HH:mm:ss"
          case 'R' => "HH:mm"
          case 'r' => "hh:mm:ss a"
          case 'v' => "d-MMM-yyyy"
          case '%' => "%"
          case other => other.toString
        })
        i += 2
      } else {
        if (c.isLetter) { out += '\''; out += c; out += '\'' }
        else out += c
        i += 1
      }
    }
    out.toString
  }

  /** Rule integer → (java format, dateOnly, timeOnly) — the reference's
    * rule table (cast.rs:216-303). */
  private val ruleFormats: Map[Long, (String, Boolean, Boolean)] = Map(
    20L -> ("yyyy-MM-dd HH:mm:ss", false, false),
    21L -> ("yyyy-MM-dd HH:mm", false, false),
    22L -> ("yyyy-MM-dd", true, false),
    30L -> ("yyyy-MM-dd hh:mm:ss a", false, false),
    31L -> ("hh:mm a", false, false),
    32L -> ("d-MMM-yyyy", true, false),
    33L -> ("d-MMM-yy", true, false),
    40L -> ("yyyyMMdd", true, false),
    60L -> ("dd/MM/yyyy HH:mm", false, false),
    61L -> ("dd/MM/yyyy", true, false),
    62L -> ("dd/MM/yyyy HH:mm:ss", false, false),
    63L -> ("ddMMyyyy HH:mm:ss", false, false),
    64L -> ("ddMMyyyy", true, false),
    100L -> ("HH:mm:ss", false, true),
    101L -> ("HH:mm", false, true))

  /** Try-lists per named rule (cast.rs:245-249). */
  private val tryLists: Map[String, Seq[Long]] = Map(
    "DATETIME" -> Seq(20L, 21L, 30L, 31L, 60L, 62L, 63L),
    "DATE" -> Seq(22L, 33L, 32L, 61L, 64L, 40L),
    "TIME" -> Seq(100L, 101L))

  /** Parse expression for one rule id → epoch-seconds long (TRY mode:
    * null on mismatch, so rules can be coalesced). */
  private def parseByRule(v: Expression, rule: Long): Expression = {
    val (fmt, _, timeOnly) = ruleFormats(rule)
    val target =
      if (timeOnly)
        fn("concat", Literal("1970-01-01 "), Cast(v, StringType))
      else Cast(v, StringType)
    val fullFmt = if (timeOnly) s"yyyy-MM-dd $fmt" else fmt
    Cast(fn("try_to_timestamp", target, Literal(fullFmt)), LongType)
  }

  private def litString(e: Expression): Option[String] = e match {
    case Literal(s, StringType) if s != null => Some(s.toString)
    case _ => None
  }
  private def litLong(e: Expression): Option[Long] = e match {
    case Literal(v, _: IntegerType) => Some(v.asInstanceOf[Int].toLong)
    case Literal(v, _: LongType) => Some(v.asInstanceOf[Long])
    case _ => None
  }
  private def isDefaultRule(e: Expression): Boolean =
    litLong(e).contains(0L) || (e match {
      case Literal(true, BooleanType) => true
      case _ => false
    })

  /** CONVERT('TYPE', value [, rule]) — type dispatch per
    * function.rs:153-166, rules per cast.rs. `tryMode` returns NULL
    * instead of erroring (TRY_CONVERT, function.rs:148-150). */
  private def convertBuilder(tryMode: Boolean)(args: Seq[Expression]): Expression = {
    require(args.length == 2 || args.length == 3,
      s"CONVERT expects 2 or 3 arguments, got ${args.length}")
    val dt = litString(args.head).map(_.toUpperCase).getOrElse(
      throw new IllegalArgumentException("CONVERT: first argument must be a type name string"))
    val v = args(1)
    val rule = args.lift(2)
    def cast(to: DataType): Expression =
      if (tryMode) tryCast(v, to) else Cast(v, to)
    dt match {
      case "BOOLEAN" => cast(BooleanType)
      case "INTEGER" => cast(LongType)
      case "FLOAT" => cast(DoubleType)
      case "TEXT" =>
        rule match {
          case None => textCast(v, tryMode)
          case Some(r) if isDefaultRule(r) => textCast(v, tryMode)
          case Some(r) =>
            // Named rules match case-sensitively like the reference
            // (cast.rs:172-190); anything else is a strftime format and
            // must keep its original case (%m month vs %M minute).
            litString(r) match {
              case Some("DATETIME") =>
                // epoch seconds → 'YYYY-MM-DD HH:MM:SS' (cast.rs:174-178)
                fn("date_format",
                  fn("timestamp_seconds", Cast(v, LongType)),
                  Literal("yyyy-MM-dd HH:mm:ss"))
              case Some("MONEY") =>
                fn("graft_money", Cast(v, DoubleType), Literal(true))
              case Some("SEPARATED") =>
                fn("graft_money", Cast(v, DoubleType), Literal(false))
              case Some(custom) =>
                // custom strftime of an epoch-seconds value (cast.rs:191-196)
                fn("date_format",
                  fn("timestamp_seconds", Cast(v, LongType)),
                  Literal(strftimeToJava(custom)))
              case None =>
                throw new IllegalArgumentException("CONVERT TEXT: rule must be a literal")
            }
        }
      case "TIMESTAMP" =>
        // → epoch-seconds I64 (function.rs:159-164)
        rule match {
          case None => Cast(v, LongType)
          case Some(r) if isDefaultRule(r) => Cast(v, LongType)
          case Some(r) =>
            litLong(r) match {
              case Some(id) if ruleFormats.contains(id) => parseByRule(v, id)
              case Some(other) =>
                throw new IllegalArgumentException(s"CONVERT TIMESTAMP: unknown rule $other")
              case None =>
                litString(r) match {
                  case Some("TIMESTAMP") => Cast(v, LongType)
                  case Some(named) if tryLists.contains(named) =>
                    Coalesce(tryLists(named).map(parseByRule(v, _)))
                  case Some(custom) => // keep case: %m month vs %M minute
                    Cast(fn("try_to_timestamp", Cast(v, StringType),
                      Literal(strftimeToJava(custom))), LongType)
                  case None =>
                    throw new IllegalArgumentException("CONVERT TIMESTAMP: rule must be a literal")
                }
            }
        }
      case other => throw new IllegalArgumentException(s"CONVERT: unimplemented type $other")
    }
  }

  /** Permissive text cast: NULL renders as 'NULL' (cast.rs:130). */
  private def textCast(v: Expression, tryMode: Boolean): Expression =
    Coalesce(Seq(
      if (tryMode) tryCast(v, StringType) else Cast(v, StringType),
      Literal("NULL")))

  /** Epoch-or-timestamp coercion: YEAR/…/SECOND accept BOTH native
    * timestamps and MultiSQL's epoch-second I64 carrier
    * (timestamp.rs:57-80: the reference extracts from I64). The
    * argument is stringified then re-read either as a datetime string
    * or as epoch seconds — type dispatch without a custom Expression,
    * at the cost of a string round trip (compat path, not the scan
    * hot path). */
  private def epochOrTs(e: Expression): Expression = {
    val s = Cast(e, StringType)
    Coalesce(Seq(
      fn("try_to_timestamp", s),
      fn("timestamp_seconds", tryCast(s, LongType))))
  }

  /** Every dialect function as a pure (name, expression-builder) pair
    * — the single source for both [[register]] (temp functions on a
    * live session) and [[graft.GraftExtensions]] (injectFunction at
    * session build). No UDFs: everything is a Catalyst expression, so
    * the whole pack codegens. */
  lazy val functionBuilders: Seq[(String, Seq[Expression] => Expression)] = {
    import org.apache.spark.sql.catalyst.FunctionIdentifier
    import org.apache.spark.sql.catalyst.analysis.FunctionRegistry

    // Builtins re-registered under internal names so wrappers can
    // dispatch through the analyzer's resolution path (time-zone-aware
    // HOUR/MINUTE/SECOND die when their builders are invoked directly).
    val builtinRenames: Seq[(String, Seq[Expression] => Expression)] =
      (Seq("rand") ++ Seq("year", "month", "day", "hour", "minute", "second")).map { p =>
        s"graft_builtin_$p" -> FunctionRegistry.builtin
          .lookupFunctionBuilder(FunctionIdentifier(p)).get
      }
    // Epoch-capable datetime part extraction shadowing the builtins.
    val parts: Seq[(String, Seq[Expression] => Expression)] =
      Seq("year", "month", "day", "hour", "minute", "second").map { p =>
        p -> ((args: Seq[Expression]) => fn(s"graft_builtin_$p", epochOrTs(args.head)))
      }

    builtinRenames ++ parts ++ Seq[(String, Seq[Expression] => Expression)](
      // IIF(c, t, f) (utility.rs:25-31)
      "iif" -> (args => If(args(0), args(1), args(2))),
      // LEN = BYTE length (utility.rs:75-78; Spark's length() is chars)
      "len" -> (args => OctetLength(args.head)),
      // NOW() = epoch seconds as I64 (timestamp.rs:103-115)
      "now" -> (_ => Cast(CurrentTimestamp(), LongType)),
      // XOR(a, b) strict-bool (binary.rs:102-106)
      "xor" -> (args => Not(EqualTo(args(0), args(1)))),
      // DATEFROMPARTS(y[,m,d,h,mi,s]) → epoch seconds (timestamp.rs:279-314)
      "datefromparts" -> { args =>
        val defaults = Seq(Literal(1), Literal(1), Literal(0), Literal(0), Literal(0))
        val padded = args ++ defaults.drop(args.length - 1)
        Cast(fn("make_timestamp", padded.take(6): _*), LongType)
      },
      // CONVERT / TRY_CONVERT rule family
      "convert" -> convertBuilder(tryMode = false),
      "try_convert" -> convertBuilder(tryMode = true),
      // DATEADD with month-end clamping — native codegen expression
      // ([[DateAddClamped]]); the Engine rewrites the DATEADD token
      // pre-parse because Spark's grammar owns it.
      "graft_dateadd" -> (args =>
        DateAddClamped(args(0), Cast(args(1), IntegerType), Cast(args(2), LongType))),
      // MONEY/SEPARATED formatting — native codegen expression.
      "graft_money" -> (args => MoneyFormat(Cast(args(0), DoubleType), args(1))),
      // RAND(min, max) → int in [min, max] (function.rs:95-113)
      "rand_range" -> { args =>
        val min = Cast(args(0), LongType)
        val max = Cast(args(1), LongType)
        val width = Cast(Add(Subtract(max, min), Literal(1L)), DoubleType)
        Cast(Add(Cast(fn("floor",
          Multiply(fn("graft_builtin_rand"), width)), LongType), min), LongType)
      },
      // RAND() / RAND(seed) keep Spark's builtin; RAND(min, max) is
      // the reference's int-range form (which errors on 1 arg — the
      // seed meaning is a documented divergence).
      "rand" -> { args =>
        if (args.length == 2)
          fn("rand_range", Cast(args(0), LongType), Cast(args(1), LongType))
        else fn("graft_builtin_rand", args: _*)
      })
  }

  // ------------------------------------------------------------------
  // Statement-level arithmetic dispatch (binary.rs:66-100,
  // recipe/new.rs:117-130)
  // ------------------------------------------------------------------

  private def isAvg(f: UnresolvedFunction): Boolean =
    f.nameParts.length == 1 && f.nameParts.head.equalsIgnoreCase("avg") &&
      f.arguments.length == 1

  private def renamed(f: UnresolvedFunction, to: String): UnresolvedFunction =
    f.copy(nameParts = Seq(to))

  /** `/` → [[DialectDivide]]; AVG(x) → SUM(x)/COUNT(x) through the
    * same dispatch, so AVG over I64 is integer math like the
    * reference (recipe/new.rs:117-130) and stays a true float mean
    * otherwise. A window AVG splits into sum/count window aggregates
    * over the same spec (DISTINCT and FILTER clauses ride along on
    * the copied UnresolvedFunction). */
  val arithmeticRule: PartialFunction[Expression, Expression] = {
    case WindowExpression(f: UnresolvedFunction, spec) if isAvg(f) =>
      DialectDivide(
        WindowExpression(renamed(f, "sum"), spec),
        WindowExpression(renamed(f, "count"), spec))
    case f: UnresolvedFunction if isAvg(f) =>
      DialectDivide(renamed(f, "sum"), renamed(f, "count"))
    case d: Divide => DialectDivide(d.left, d.right)
  }

  /** Apply [[arithmeticRule]] to a freshly-parsed (pre-analysis) plan
    * — before type coercion, so the tree is exactly what the user
    * wrote and explicit CASTs keep Spark semantics. Subquery plans
    * nested inside expressions are rewritten too. */
  def rewriteArithmetic(
      plan: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan)
      : org.apache.spark.sql.catalyst.plans.logical.LogicalPlan =
    plan.transformAllExpressionsWithSubqueries(arithmeticRule)

  /** The same dispatch for a bare parsed expression (UPDATE SET /
    * WHERE fragments). */
  def rewriteArithmeticExpr(e: Expression): Expression =
    e.transformDown(arithmeticRule)

  // ------------------------------------------------------------------
  // NULL-comparison compat mode (binary.rs:51-64, value/mod.rs:145-188)
  // ------------------------------------------------------------------

  /** Reference comparisons never return NULL: `comparative_binary_op`
    * wraps the host `==`/`<`/… (binary.rs:51-64) whose
    * PartialEq/PartialOrd have no Null arm (value/mod.rs:145-188), so
    * `NULL = x` is `false` and — because Rust's `!=` is the negation
    * of `eq` — `NULL != x` is `true`. Spark's three-valued logic
    * yields NULL for both, which flips `WHERE NOT (x = y)` on
    * nullable columns. Wrapping each comparison in
    * `coalesce(_, false)` reproduces the reference exactly, including
    * the `!=` asymmetry (Spark parses `a != b` as `NOT (a = b)`, and
    * the NOT lands *outside* the wrap). `<=>` is already null-total
    * and `IS [NOT] NULL` are not comparisons — untouched; arithmetic
    * keeps propagating NULL (generic! macro, binary.rs:66-92), which
    * Spark matches natively. */
  val nullCompareRule: PartialFunction[Expression, Expression] = {
    case c: BinaryComparison if !c.isInstanceOf[EqualNullSafe] =>
      Coalesce(Seq(c, Literal(false)))
  }

  /** Bottom-up so the freshly-built Coalesce wrapper is not re-visited
    * (a top-down transform would re-match the inner comparison forever). */
  def rewriteNullCompare(
      plan: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan)
      : org.apache.spark.sql.catalyst.plans.logical.LogicalPlan =
    plan.transformUpWithSubqueries { case p => p.transformExpressionsUp(nullCompareRule) }

  def rewriteNullCompareExpr(e: Expression): Expression =
    e.transformUp(nullCompareRule)

  @volatile private var registeredSessions = Set.empty[SparkSession]

  /** Register the pack into `spark`'s function registry (idempotent). */
  def register(spark: SparkSession): Unit = synchronized {
    if (registeredSessions.contains(spark)) return
    val reg = spark.sessionState.functionRegistry
    functionBuilders.foreach { case (name, builder) =>
      reg.createOrReplaceTempFunction(name, builder, "built-in")
    }
    registeredSessions += spark
  }
}
