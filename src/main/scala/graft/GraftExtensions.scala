package graft

import org.apache.spark.sql.{AnalysisException, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import org.apache.spark.sql.types.{ByteType, IntegerType, LongType, ShortType}

import org.apache.spark.sql.catalyst.expressions.{Add, BitwiseAnd, BitwiseOr, CaseWhen, Cast, Floor, GreaterThan, Least, LessThanOrEqual, Literal, Multiply, Remainder, ShiftLeft, ShiftRight, Sqrt, Subtract}
import org.apache.spark.sql.types.DoubleType

import graft.expressions.{DistinctShingles, DotProductLong, UnicodeNormalize}

/** SparkSessionExtensions entry point — the deployment hook that makes
  * the library's custom Catalyst expressions first-class SQL functions:
  *
  * {{{
  *   spark-submit --conf spark.sql.extensions=graft.GraftExtensions ...
  *   // or
  *   SparkSession.builder().withExtensions(new GraftExtensions) ...
  * }}}
  *
  * after which `SELECT dot_product_long(qa, qb)` works in plain SQL —
  * the Scala DataFrame API reaches the same expression through
  * [[graft.operators.Embeddings.dotQ]] without any registration.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  /** AnalysisException (not a raw runtime error) carrying the failing
    * expression's parse position — what a SQL user expects from a bad
    * function argument. USER_RAISED_EXCEPTION renders the message
    * verbatim. */
  private def analysisError(msg: String, at: Expression): Nothing =
    throw new AnalysisException(
      "USER_RAISED_EXCEPTION", Map("errorMessage" -> msg), at.origin)

  /** Foldable string argument of a table function (table/column names,
    * column refs make no sense before the relation exists). */
  private def foldString(fn: String, what: String, e: Expression): String =
    (if (e.resolved) e.dataType else org.apache.spark.sql.types.NullType) match {
      case org.apache.spark.sql.types.StringType if e.foldable =>
        e.eval() match {
          case null => analysisError(s"$fn: $what must not be NULL", e)
          case v => v.toString
        }
      case _ => analysisError(
        s"$fn: $what must be a foldable string literal, got ${e.sql}", e)
    }

  /** Foldable integral argument of a table function. */
  private def foldLong(fn: String, what: String, e: Expression): Long =
    (if (e.resolved) e.dataType else org.apache.spark.sql.types.NullType) match {
      case ByteType | ShortType | IntegerType | LongType if e.foldable =>
        e.eval() match {
          case null => analysisError(s"$fn: $what must not be NULL", e)
          case v: Byte => v.toLong
          case v: Short => v.toLong
          case v: Int => v.toLong
          case v: Long => v
          case v => analysisError(s"$fn: $what out of range: $v", e)
        }
      case _ => analysisError(
        s"$fn: $what must be a foldable integer expression, got ${e.sql}", e)
    }

  /** Foldable map<string, integral> argument of a table function
    * (per-stratum budget overrides): a `map('web', 1000, …)` literal,
    * evaluated at analysis time like every other table-function
    * argument. */
  private def foldStringLongMap(
      fn: String, what: String, e: Expression): Seq[(String, Long)] = {
    val integral: Set[org.apache.spark.sql.types.DataType] =
      Set(ByteType, ShortType, IntegerType, LongType)
    (if (e.resolved) e.dataType else org.apache.spark.sql.types.NullType) match {
      case org.apache.spark.sql.types.MapType(
          org.apache.spark.sql.types.StringType, vt, _)
          if e.foldable && integral(vt) =>
        // CreateMap.eval throws a raw RuntimeException on duplicate
        // keys (mapKeyDedupPolicy=EXCEPTION) — surface it as the same
        // positioned AnalysisException as every other argument error
        (try e.eval()
        catch {
          case ex: RuntimeException =>
            analysisError(s"$fn: $what is not a valid map literal: " +
              s"${ex.getMessage}", e)
        }) match {
          case null => analysisError(s"$fn: $what must not be NULL", e)
          case m: org.apache.spark.sql.catalyst.util.MapData =>
            val keys = m.keyArray()
            val vals = m.valueArray()
            (0 until m.numElements()).map { i =>
              if (keys.isNullAt(i) || vals.isNullAt(i))
                analysisError(s"$fn: $what entries must not be NULL", e)
              val v = vt match {
                case LongType => vals.getLong(i)
                case IntegerType => vals.getInt(i).toLong
                case ShortType => vals.getShort(i).toLong
                case _ => vals.getByte(i).toLong
              }
              (keys.getUTF8String(i).toString, v)
            }
          case v => analysisError(s"$fn: $what out of range: $v", e)
        }
      // an empty `map()` literal types as map<string,string> — accept
      // any foldable EMPTY map as "no overrides". The guard's eval gets
      // the same duplicate-key translation as the integral path: a
      // foldable map('a','x','a','y') throws from CreateMap.eval right
      // here, and must surface as the positioned argument error, not a
      // raw SparkRuntimeException (the r14 advice).
      case _: org.apache.spark.sql.types.MapType if e.foldable &&
          ((try e.eval()
          catch {
            case ex: RuntimeException =>
              analysisError(s"$fn: $what is not a valid map literal: " +
                s"${ex.getMessage}", e)
          }) match {
            case m: org.apache.spark.sql.catalyst.util.MapData => m.numElements() == 0
            case _ => false
          }) =>
        Seq.empty
      case _ => analysisError(
        s"$fn: $what must be a foldable map(string, integer) literal " +
          s"(e.g. map('web', 1000)), got ${e.sql}", e)
    }
  }

  /** Foldable boolean argument of a table function. */
  private def foldBool(fn: String, what: String, e: Expression): Boolean =
    (if (e.resolved) e.dataType else org.apache.spark.sql.types.NullType) match {
      case org.apache.spark.sql.types.BooleanType if e.foldable =>
        e.eval() match {
          case null => analysisError(s"$fn: $what must not be NULL", e)
          case v: Boolean => v
          case v => analysisError(s"$fn: $what out of range: $v", e)
        }
      case _ => analysisError(
        s"$fn: $what must be a foldable boolean expression, got ${e.sql}", e)
    }

  /** Resolve a table-function's table-name argument against the ACTIVE
    * session's catalog (temp views included) — the analyzer invoking
    * the builder runs under that session. */
  private def tableOf(fn: String, e: Expression): org.apache.spark.sql.DataFrame = {
    val name = foldString(fn, "table name", e)
    val spark = org.apache.spark.sql.SparkSession.active
    try spark.table(name)
    catch {
      // translate ONLY the genuinely-missing case into the table
      // function's own error (with the argument's position attached);
      // any other analysis failure — e.g. a temp view whose underlying
      // plan no longer resolves — keeps its original, specific message.
      case ex: AnalysisException
          if Option(ex.getCondition).exists(_.startsWith("TABLE_OR_VIEW_NOT_FOUND")) =>
        analysisError(s"$fn: table or view not found: $name", e)
    }
  }

  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      FunctionIdentifier("dot_product_long"),
      new ExpressionInfo(
        classOf[DotProductLong].getName,
        null,
        "dot_product_long",
        "dot_product_long(a, b) - exact int64 dot product of two array<bigint> columns",
        "", "", "", "misc_funcs", "1.0.0", "", "built-in"),
      (exprs: Seq[Expression]) => {
        if (exprs.length != 2) analysisError(
          s"dot_product_long takes exactly 2 arguments, got ${exprs.length}",
          exprs.headOption.getOrElse(org.apache.spark.sql.catalyst.expressions.Literal(null)))
        DotProductLong(exprs.head, exprs(1))
      }))

    ext.injectFunction((
      FunctionIdentifier("distinct_shingles"),
      new ExpressionInfo(
        classOf[DistinctShingles].getName,
        null,
        "distinct_shingles",
        "distinct_shingles(tokens, n) - distinct word n-grams of an array<string>, first-occurrence order",
        "", "", "", "misc_funcs", "1.0.0", "", "built-in"),
      (exprs: Seq[Expression]) => {
        if (exprs.length != 2) analysisError(
          s"distinct_shingles takes exactly 2 arguments, got ${exprs.length}",
          exprs.headOption.getOrElse(org.apache.spark.sql.catalyst.expressions.Literal(null)))
        // n: any FOLDABLE integral expression — a bare literal, but also
        // CAST(2 AS INT), 1+1, a smallint/bigint literal, … — folded at
        // registration time; non-foldable / non-integral / out-of-range
        // shapes fail analysis with the expression's position attached.
        val nExpr = exprs(1)
        // dataType on an unresolved expression throws UnresolvedException;
        // gate on resolved first so a column-reference argument gets the
        // clean position-carrying analysis message below instead.
        val n = (if (nExpr.resolved) nExpr.dataType else org.apache.spark.sql.types.NullType) match {
          case ByteType | ShortType | IntegerType | LongType if nExpr.foldable =>
            nExpr.eval() match {
              case null => analysisError("distinct_shingles: n must not be NULL", nExpr)
              case v: Byte => v.toInt
              case v: Short => v.toInt
              case v: Int => v
              case v: Long if v >= 1 && v <= Int.MaxValue => v.toInt
              case v => analysisError(s"distinct_shingles: n out of range: $v", nExpr)
            }
          case _ => analysisError(
            s"distinct_shingles: n must be a foldable integer expression, got ${nExpr.sql}",
            nExpr)
        }
        if (n < 1) analysisError(s"distinct_shingles: n must be >= 1, got $n", nExpr)
        DistinctShingles(exprs.head, n)
      }))

    ext.injectFunction((
      FunctionIdentifier("unicode_normalize"),
      new ExpressionInfo(
        classOf[UnicodeNormalize].getName,
        null,
        "unicode_normalize",
        "unicode_normalize(str, form) - Unicode-normalize a string; form is a " +
          "foldable string in ('NFC','NFD','NFKC','NFKD')",
        "", "", "", "misc_funcs", "1.0.0", "", "built-in"),
      (exprs: Seq[Expression]) => {
        if (exprs.length != 2) analysisError(
          s"unicode_normalize takes exactly 2 arguments, got ${exprs.length}",
          exprs.headOption.getOrElse(Literal(null)))
        val formExpr = exprs(1)
        val form = (if (formExpr.resolved) formExpr.dataType
          else org.apache.spark.sql.types.NullType) match {
          case org.apache.spark.sql.types.StringType if formExpr.foldable =>
            formExpr.eval() match {
              case null => analysisError(
                "unicode_normalize: form must not be NULL", formExpr)
              case v => UnicodeNormalize.formOf(v.toString).getOrElse(
                analysisError(
                  s"unicode_normalize: unknown normalization form '$v' " +
                    "(expected NFC, NFD, NFKC or NFKD)", formExpr))
            }
          case _ => analysisError(
            s"unicode_normalize: form must be a foldable string literal, got ${formExpr.sql}",
            formExpr)
        }
        UnicodeNormalize(exprs.head, form)
      }))

    // The determinism primitives, composed from built-in CATALYST
    // arithmetic (a Column-bridge composition would hand the registry
    // unresolved ColumnNodes — registry builders must return plain
    // expression trees, which the analyzer then type-coerces). The
    // constants come from the same single sources the Scala operators
    // use, so the SQL surface can never drift.
    ext.injectFunction((
      FunctionIdentifier("hash_order"),
      new ExpressionInfo(
        graft.operators.Curation.getClass.getName,
        null,
        "hash_order",
        "hash_order(id) - the deterministic multiplicative-hash shuffle order of an int64 id",
        "", "", "", "misc_funcs", "1.0.0", "", "built-in"),
      (exprs: Seq[Expression]) => {
        if (exprs.length != 1) analysisError(
          s"hash_order takes exactly 1 argument, got ${exprs.length}",
          exprs.headOption.getOrElse(Literal(null)))
        new Remainder(
          new Multiply(
            new Remainder(exprs.head, Literal(2147483647L)),
            Literal(graft.operators.Curation.HashMul)),
          Literal(4294967296L))
      }))

    ext.injectFunction((
      FunctionIdentifier("z_value"),
      new ExpressionInfo(
        graft.operators.Layout.getClass.getName,
        null,
        "z_value",
        "z_value(bits, d1, d2, ...) - Morton bit-interleave of dimensions already in [0, 2^bits)",
        "", "", "", "misc_funcs", "1.0.0", "", "built-in"),
      (exprs: Seq[Expression]) => {
        if (exprs.length < 2) analysisError(
          s"z_value takes a bits literal plus at least 1 dimension, got ${exprs.length} arguments",
          exprs.headOption.getOrElse(org.apache.spark.sql.catalyst.expressions.Literal(null)))
        val bitsExpr = exprs.head
        val bits = (if (bitsExpr.resolved) bitsExpr.dataType
          else org.apache.spark.sql.types.NullType) match {
          case ByteType | ShortType | IntegerType | LongType if bitsExpr.foldable =>
            bitsExpr.eval() match {
              case null => analysisError("z_value: bits must not be NULL", bitsExpr)
              case v: Byte => v.toInt
              case v: Short => v.toInt
              case v: Int => v
              case v: Long if v >= 1 && v <= 62 => v.toInt
              case v => analysisError(s"z_value: bits out of range: $v", bitsExpr)
            }
          case _ => analysisError(
            s"z_value: bits must be a foldable integer expression, got ${bitsExpr.sql}",
            bitsExpr)
        }
        val dims = exprs.tail
        if (bits * dims.size > 62) analysisError(
          s"z_value: bits * dims = ${bits * dims.size} exceeds int64", bitsExpr)
        val d = dims.size
        val terms = for {
          j <- 0 until bits
          (c, i) <- dims.zipWithIndex
        } yield ShiftLeft(
          BitwiseAnd(ShiftRight(c, Literal(j)), Literal(1L)),
          Literal(j * d + i))
        terms.reduce[Expression]((a, b) => BitwiseOr(a, b))
      }))

    ext.injectFunction((
      FunctionIdentifier("isqrt"),
      new ExpressionInfo(
        graft.operators.Curation.getClass.getName,
        null,
        "isqrt",
        "isqrt(n) - exact integer square root of a non-negative int64 " +
          "(float estimate + overflow-safe correction; engine-exact)",
        "", "", "", "misc_funcs", "1.0.0", "", "built-in"),
      (exprs: Seq[Expression]) => {
        if (exprs.length != 1) analysisError(
          s"isqrt takes exactly 1 argument, got ${exprs.length}",
          exprs.headOption.getOrElse(Literal(null)))
        // the same capped-correction tree as Curation.isqrt — candidates
        // clamp at floor(sqrt(Long.MaxValue)) so the squared probes
        // cannot overflow under ANSI mode
        val n = exprs.head
        val cap = Literal(3037000499L)
        val s0 = Least(Seq(Floor(Sqrt(Cast(n, DoubleType))), cap))
        val m = Least(Seq(Add(s0, Literal(1L)), cap))
        val s1 = CaseWhen(Seq((LessThanOrEqual(Multiply(m, m), n), m)), Some(s0))
        CaseWhen(
          Seq((GreaterThan(Multiply(s1, s1), n), Subtract(s1, Literal(1L)))),
          Some(s1))
      }))

    // ---- TABLE-VALUED operators: the top table-level operators as SQL
    // `SELECT * FROM op('table', ...)` forms, so the engine is usable
    // with no Scala at all. Each builder applies the SAME Scala
    // operator to the named table and hands the analyzer the resulting
    // logical plan — one definition, two surfaces, zero drift
    // (SqlSurfaceSpec asserts SQL-vs-API plan-result equality). Table
    // and column names must be foldable strings (they select the
    // relation, so they cannot come FROM a relation).

    ext.injectTableFunction((
      FunctionIdentifier("near_dup_pairs"),
      new ExpressionInfo(
        graft.operators.NearDup.getClass.getName,
        null,
        "near_dup_pairs",
        "near_dup_pairs(table[, id_col, text_col]) - confirmed MinHash near-duplicate " +
          "pairs (doc_a, doc_b, jaccard_x1000) over the named table/view",
        "", "", "", "table_funcs", "1.0.0", "", "built-in"),
      (exprs: Seq[Expression]) => {
        if (exprs.isEmpty || exprs.length > 3) analysisError(
          s"near_dup_pairs takes 1 to 3 arguments, got ${exprs.length}",
          exprs.headOption.getOrElse(Literal(null)))
        val docs = tableOf("near_dup_pairs", exprs.head)
        val idCol =
          if (exprs.length > 1) foldString("near_dup_pairs", "id_col", exprs(1))
          else "doc_id"
        val textCol =
          if (exprs.length > 2) foldString("near_dup_pairs", "text_col", exprs(2))
          else "text"
        graft.operators.NearDup.minHashPairs(docs, idCol, textCol)
          .queryExecution.logical
      }))

    ext.injectTableFunction((
      FunctionIdentifier("session_stats"),
      new ExpressionInfo(
        graft.operators.Sessions.getClass.getName,
        null,
        "session_stats",
        "session_stats(table[, gap_micros, user_col, ts_col, tie_col]) - gap-" +
          "sessionized per-session rollup (user, session_seq, n_events, t_start, t_end)",
        "", "", "", "table_funcs", "1.0.0", "", "built-in"),
      (exprs: Seq[Expression]) => {
        if (exprs.isEmpty || exprs.length > 5) analysisError(
          s"session_stats takes 1 to 5 arguments, got ${exprs.length}",
          exprs.headOption.getOrElse(Literal(null)))
        val events = tableOf("session_stats", exprs.head)
        val gap =
          if (exprs.length > 1) foldLong("session_stats", "gap_micros", exprs(1))
          else graft.operators.Sessions.DefaultGapMicros
        if (gap < 1) analysisError(
          s"session_stats: gap_micros must be >= 1, got $gap", exprs(1))
        def strArg(i: Int, what: String, default: String) =
          if (exprs.length > i) foldString("session_stats", what, exprs(i))
          else default
        graft.operators.Sessions.sessionStats(events, gap,
          strArg(2, "user_col", "user_id"), strArg(3, "ts_col", "ts"),
          strArg(4, "tie_col", "event_id"))
          .queryExecution.logical
      }))

    ext.injectTableFunction((
      FunctionIdentifier("sample_weighted"),
      new ExpressionInfo(
        graft.operators.Curation.getClass.getName,
        null,
        "sample_weighted",
        "sample_weighted(table, k[, id_col, weight_col]) - deterministic weighted " +
          "top-k sample (integer priority sampling; replayable bit-for-bit)",
        "", "", "", "table_funcs", "1.0.0", "", "built-in"),
      (exprs: Seq[Expression]) => {
        if (exprs.length < 2 || exprs.length > 4) analysisError(
          s"sample_weighted takes 2 to 4 arguments, got ${exprs.length}",
          exprs.headOption.getOrElse(Literal(null)))
        val df = tableOf("sample_weighted", exprs.head)
        val k = foldLong("sample_weighted", "k", exprs(1))
        if (k < 1 || k > Int.MaxValue) analysisError(
          s"sample_weighted: k must be in [1, ${Int.MaxValue}], got $k", exprs(1))
        val idCol =
          if (exprs.length > 2) foldString("sample_weighted", "id_col", exprs(2))
          else "doc_id"
        val weightCol =
          if (exprs.length > 3) foldString("sample_weighted", "weight_col", exprs(3))
          else "n_chars"
        graft.operators.Curation.sampleWeighted(df, k.toInt, idCol, weightCol)
          .queryExecution.logical
      }))

    ext.injectTableFunction((
      FunctionIdentifier("coverage_sample"),
      new ExpressionInfo(
        graft.operators.Curation.getClass.getName,
        null,
        "coverage_sample",
        "coverage_sample(scored_table, cells_table[, per_cell]) - top per_cell " +
          "records per cluster cell by (score_milli DESC, doc_id): selection " +
          "balanced by embedding-space coverage (cells_table: vec_id, cell)",
        "", "", "", "table_funcs", "1.0.0", "", "built-in"),
      (exprs: Seq[Expression]) => {
        if (exprs.length < 2 || exprs.length > 3) analysisError(
          s"coverage_sample takes 2 to 3 arguments, got ${exprs.length}",
          exprs.headOption.getOrElse(Literal(null)))
        val scored = tableOf("coverage_sample", exprs.head)
        val cells = tableOf("coverage_sample", exprs(1))
        val perCell =
          if (exprs.length > 2) foldLong("coverage_sample", "per_cell", exprs(2))
          else 1L
        if (perCell < 1 || perCell > Int.MaxValue) analysisError(
          s"coverage_sample: per_cell must be in [1, ${Int.MaxValue}], got $perCell",
          exprs(2))
        graft.operators.Curation.coverageSample(scored, cells, perCell.toInt)
          .queryExecution.logical
      }))

    ext.injectTableFunction((
      FunctionIdentifier("er_pairs"),
      new ExpressionInfo(
        graft.operators.Er.getClass.getName,
        null,
        "er_pairs",
        "er_pairs(table[, id_col, name_col, max_key_freq]) - confirmed fuzzy " +
          "self-match pairs (id_a, id_b, dist) under edit distance 1: SymSpell " +
          "deletion-neighborhood blocking + banded-Levenshtein confirm",
        "", "", "", "table_funcs", "1.0.0", "", "built-in"),
      (exprs: Seq[Expression]) => {
        if (exprs.isEmpty || exprs.length > 4) analysisError(
          s"er_pairs takes 1 to 4 arguments, got ${exprs.length}",
          exprs.headOption.getOrElse(Literal(null)))
        val df = tableOf("er_pairs", exprs.head)
        val idCol =
          if (exprs.length > 1) foldString("er_pairs", "id_col", exprs(1))
          else "c_custkey"
        val nameCol =
          if (exprs.length > 2) foldString("er_pairs", "name_col", exprs(2))
          else "c_name"
        val cap =
          if (exprs.length > 3) Some(foldLong("er_pairs", "max_key_freq", exprs(3)))
          else None
        cap.foreach { c =>
          if (c < 1) analysisError(
            s"er_pairs: max_key_freq must be >= 1, got $c", exprs(3))
        }
        graft.operators.Er.fuzzyPairs(df, idCol, nameCol, maxEdit = 1, maxKeyFreq = cap)
          .queryExecution.logical
      }))

    ext.injectTableFunction((
      FunctionIdentifier("topk_recall"),
      new ExpressionInfo(
        graft.operators.Eval.getClass.getName,
        null,
        "topk_recall",
        "topk_recall(found_table, truth_table[, query_col, id_col]) - one-row " +
          "ANN recall@k report: (query, neighbor) hits of the approximate " +
          "top-k against the exact top-k truth, micro recall in permille",
        "", "", "", "table_funcs", "1.0.0", "", "built-in"),
      (exprs: Seq[Expression]) => {
        if (exprs.length < 2 || exprs.length > 4) analysisError(
          s"topk_recall takes 2 to 4 arguments, got ${exprs.length}",
          exprs.headOption.getOrElse(Literal(null)))
        val found = tableOf("topk_recall", exprs.head)
        val truth = tableOf("topk_recall", exprs(1))
        val queryCol =
          if (exprs.length > 2) foldString("topk_recall", "query_col", exprs(2))
          else "query_id"
        val idCol =
          if (exprs.length > 3) foldString("topk_recall", "id_col", exprs(3))
          else "neighbor_id"
        graft.operators.Eval.topKRecall(found, truth, queryCol, idCol)
          .queryExecution.logical
      }))

    ext.injectTableFunction((
      FunctionIdentifier("decontaminate_fuzzy"),
      new ExpressionInfo(
        graft.operators.Curation.getClass.getName,
        null,
        "decontaminate_fuzzy",
        "decontaminate_fuzzy(train_table, benchmark_table[, threshold_milli, " +
          "id_col, text_col]) - the training rows that are NOT confirmed " +
          "MinHash near-duplicates of any benchmark row (paraphrase-tolerant " +
          "decontamination; id spaces must be disjoint)",
        "", "", "", "table_funcs", "1.0.0", "", "built-in"),
      (exprs: Seq[Expression]) => {
        if (exprs.length < 2 || exprs.length > 5) analysisError(
          s"decontaminate_fuzzy takes 2 to 5 arguments, got ${exprs.length}",
          exprs.headOption.getOrElse(Literal(null)))
        val train = tableOf("decontaminate_fuzzy", exprs.head)
        val bench = tableOf("decontaminate_fuzzy", exprs(1))
        val threshold =
          if (exprs.length > 2)
            foldLong("decontaminate_fuzzy", "threshold_milli", exprs(2))
          else graft.operators.NearDup.ThresholdMilli.toLong
        if (threshold < 1 || threshold > 1000) analysisError(
          s"decontaminate_fuzzy: threshold_milli must be in [1, 1000], got $threshold",
          exprs(2))
        val idCol =
          if (exprs.length > 3) foldString("decontaminate_fuzzy", "id_col", exprs(3))
          else "doc_id"
        val textCol =
          if (exprs.length > 4) foldString("decontaminate_fuzzy", "text_col", exprs(4))
          else "text"
        // the two-frame core directly — surviving train rows keep ALL
        // their columns, exactly like the Scala predicate form
        graft.operators.Curation.decontaminateFuzzyBetween(
            train, bench, idCol, textCol, threshold.toInt)
          .queryExecution.logical
      }))

    ext.injectTableFunction((
      FunctionIdentifier("pair_recall"),
      new ExpressionInfo(
        graft.operators.Eval.getClass.getName,
        null,
        "pair_recall",
        "pair_recall(found_table, truth_table[, a_col, b_col]) - one-row " +
          "recall/precision report of found pairs vs a truth pair relation " +
          "(pairs normalized (least, greatest) + distinct; permilles rounded; " +
          "vacuous flags an empty denominator)",
        "", "", "", "table_funcs", "1.0.0", "", "built-in"),
      (exprs: Seq[Expression]) => {
        if (exprs.length < 2 || exprs.length > 4) analysisError(
          s"pair_recall takes 2 to 4 arguments, got ${exprs.length}",
          exprs.headOption.getOrElse(Literal(null)))
        val found = tableOf("pair_recall", exprs.head)
        val truth = tableOf("pair_recall", exprs(1))
        val aCol =
          if (exprs.length > 2) foldString("pair_recall", "a_col", exprs(2))
          else "vec_a"
        val bCol =
          if (exprs.length > 3) foldString("pair_recall", "b_col", exprs(3))
          else "vec_b"
        graft.operators.Eval.pairRecall(found, truth, aCol, bCol)
          .queryExecution.logical
      }))

    ext.injectTableFunction((
      FunctionIdentifier("transitions"),
      new ExpressionInfo(
        graft.operators.Sessions.getClass.getName,
        null,
        "transitions",
        "transitions(table[, user_col, ts_col, type_col, tie_col]) - " +
          "first-order Markov transition matrix over each user's event " +
          "sequence: (from_type, to_type, n, share_x1000)",
        "", "", "", "table_funcs", "1.0.0", "", "built-in"),
      (exprs: Seq[Expression]) => {
        if (exprs.isEmpty || exprs.length > 5) analysisError(
          s"transitions takes 1 to 5 arguments, got ${exprs.length}",
          exprs.headOption.getOrElse(Literal(null)))
        val events = tableOf("transitions", exprs.head)
        def strArg(i: Int, what: String, default: String) =
          if (exprs.length > i) foldString("transitions", what, exprs(i))
          else default
        graft.operators.Sessions.transitions(events,
            strArg(1, "user_col", "user_id"), strArg(2, "ts_col", "ts"),
            strArg(3, "type_col", "event_type"), strArg(4, "tie_col", "event_id"))
          .queryExecution.logical
      }))

    ext.injectTableFunction((
      FunctionIdentifier("asof_join"),
      new ExpressionInfo(
        graft.operators.Sessions.getClass.getName,
        null,
        "asof_join",
        "asof_join(left_table, right_table, key_col, ts_col, payload_col" +
          "[, tolerance_micros, forward]) - per key, each left row joined " +
          "to the latest right row at-or-before its timestamp (earliest " +
          "at-or-after when forward; NULL payload when none / outside the " +
          "tolerance horizon)",
        "", "", "", "table_funcs", "1.0.0", "", "built-in"),
      (exprs: Seq[Expression]) => {
        if (exprs.length < 5 || exprs.length > 7) analysisError(
          s"asof_join takes 5 to 7 arguments, got ${exprs.length}",
          exprs.headOption.getOrElse(Literal(null)))
        val left = tableOf("asof_join", exprs.head)
        val right = tableOf("asof_join", exprs(1))
        val keyCol = foldString("asof_join", "key_col", exprs(2))
        val tsCol = foldString("asof_join", "ts_col", exprs(3))
        val payloadCol = foldString("asof_join", "payload_col", exprs(4))
        val tol =
          if (exprs.length > 5) Some(foldLong("asof_join", "tolerance_micros", exprs(5)))
          else None
        tol.foreach { t =>
          if (t < 1) analysisError(
            s"asof_join: tolerance_micros must be >= 1, got $t", exprs(5))
        }
        val forward =
          if (exprs.length > 6) foldBool("asof_join", "forward", exprs(6))
          else false
        if (left.columns.contains(payloadCol)) analysisError(
          s"asof_join: payload_col '$payloadCol' collides with a left-table column",
          exprs(4))
        graft.operators.Sessions.asofJoin(left, right,
            keys = Seq(keyCol), tsCol = tsCol, payload = Seq(payloadCol),
            toleranceMicros = tol, forward = forward)
          .queryExecution.logical
      }))

    ext.injectTableFunction((
      FunctionIdentifier("funnel"),
      new ExpressionInfo(
        graft.operators.Sessions.getClass.getName,
        null,
        "funnel",
        "funnel(table, stages_csv, tolerance_micros[, user_col, ts_col, " +
          "type_col, tie_col]) - per-user N-stage funnel attribution: each " +
          "last-stage event walks backwards through the comma-separated " +
          "stage list, attributing each hop to the user's latest stage " +
          "event at-or-before the previous hop within the tolerance; " +
          "output (user, n_<stageK>, ..., n_<stage1>)",
        "", "", "", "table_funcs", "1.0.0", "", "built-in"),
      (exprs: Seq[Expression]) => {
        if (exprs.length < 3 || exprs.length > 7) analysisError(
          s"funnel takes 3 to 7 arguments, got ${exprs.length}",
          exprs.headOption.getOrElse(Literal(null)))
        val events = tableOf("funnel", exprs.head)
        val stages = foldString("funnel", "stages_csv", exprs(1))
          .split(",").toSeq.map(_.trim).filter(_.nonEmpty)
        if (stages.size < 2) analysisError(
          s"funnel: stages_csv must name >= 2 comma-separated stages, " +
            s"got '${foldString("funnel", "stages_csv", exprs(1))}'", exprs(1))
        if (stages.distinct.size != stages.size) analysisError(
          s"funnel: stages must be distinct, got $stages", exprs(1))
        val tol = foldLong("funnel", "tolerance_micros", exprs(2))
        if (tol < 1) analysisError(
          s"funnel: tolerance_micros must be >= 1, got $tol", exprs(2))
        def strArg(i: Int, what: String, default: String) =
          if (exprs.length > i) foldString("funnel", what, exprs(i))
          else default
        graft.operators.Sessions.funnel(events, stages, tol,
            strArg(3, "user_col", "user_id"), strArg(4, "ts_col", "ts"),
            strArg(5, "type_col", "event_type"), strArg(6, "tie_col", "event_id"))
          .queryExecution.logical
      }))

    ext.injectTableFunction((
      FunctionIdentifier("dedup_clusters"),
      new ExpressionInfo(
        graft.operators.DedupClusters.getClass.getName,
        null,
        "dedup_clusters",
        "dedup_clusters(pairs_table[, a_col, b_col]) - connected components " +
          "over a pair table (star-contraction, logarithmic rounds): " +
          "(doc_id, cluster_id, cluster_size, is_canonical), cluster_id = " +
          "the cluster's minimum member id",
        "", "", "", "table_funcs", "1.0.0", "", "built-in"),
      (exprs: Seq[Expression]) => {
        if (exprs.isEmpty || exprs.length > 3) analysisError(
          s"dedup_clusters takes 1 to 3 arguments, got ${exprs.length}",
          exprs.headOption.getOrElse(Literal(null)))
        val pairs = tableOf("dedup_clusters", exprs.head)
        val aCol =
          if (exprs.length > 1) foldString("dedup_clusters", "a_col", exprs(1))
          else "doc_a"
        val bCol =
          if (exprs.length > 2) foldString("dedup_clusters", "b_col", exprs(2))
          else "doc_b"
        graft.operators.DedupClusters.resolve(pairs, aCol, bCol)
          .queryExecution.logical
      }))

    ext.injectTableFunction((
      FunctionIdentifier("search"),
      new ExpressionInfo(
        graft.operators.Relevance.getClass.getName,
        null,
        "search",
        "search(docs_table, query[, k, id_col, text_col]) - BM25 retrieval of " +
          "the top-k documents for a whitespace-separated bag-of-terms query " +
          "(terms match whitespace tokens of text_col exactly): " +
          "(id, n_hit_terms, score_x1000, rnk)",
        "", "", "", "table_funcs", "1.0.0", "", "built-in"),
      (exprs: Seq[Expression]) => {
        if (exprs.length < 2 || exprs.length > 5) analysisError(
          s"search takes 2 to 5 arguments, got ${exprs.length}",
          exprs.headOption.getOrElse(Literal(null)))
        val docs = tableOf("search", exprs.head)
        val terms = foldString("search", "query", exprs(1))
          .split("\\s+").toSeq.filter(_.nonEmpty)
        if (terms.isEmpty) analysisError(
          "search: query must contain at least one term", exprs(1))
        val k =
          if (exprs.length > 2) foldLong("search", "k", exprs(2))
          else 10L
        if (k < 1 || k > Int.MaxValue) analysisError(
          s"search: k must be >= 1, got $k", exprs(2))
        def strArg(i: Int, what: String, default: String) =
          if (exprs.length > i) foldString("search", what, exprs(i))
          else default
        val idCol = strArg(3, "id_col", "doc_id")
        val textCol = strArg(4, "text_col", "text")
        val toks = graft.operators.Tokenize.splitTokens(inputCol = textCol)(
          docs.select(idCol, textCol))
        graft.operators.Relevance.search(toks, terms, k.toInt, idCol)
          .queryExecution.logical
      }))

    // the corpus-to-batches curation chain as SQL: per-domain capping,
    // budgeted mixing, and fixed-budget packing — previously Scala-only
    ext.injectTableFunction((
      FunctionIdentifier("domain_cap"),
      new ExpressionInfo(
        graft.operators.Curation.getClass.getName,
        null,
        "domain_cap",
        "domain_cap(table, k[, domain_col, id_col, text_col]) - top-k " +
          "documents per domain by the integer quality score " +
          "(score DESC, id ASC): (id, domain, score_milli, domain_rank)",
        "", "", "", "table_funcs", "1.0.0", "", "built-in"),
      (exprs: Seq[Expression]) => {
        if (exprs.length < 2 || exprs.length > 5) analysisError(
          s"domain_cap takes 2 to 5 arguments, got ${exprs.length}",
          exprs.headOption.getOrElse(Literal(null)))
        val docs = tableOf("domain_cap", exprs.head)
        val k = foldLong("domain_cap", "k", exprs(1))
        if (k < 1 || k > Int.MaxValue) analysisError(
          s"domain_cap: k must be in [1, ${Int.MaxValue}], got $k", exprs(1))
        def strArg(i: Int, what: String, default: String) =
          if (exprs.length > i) foldString("domain_cap", what, exprs(i))
          else default
        graft.operators.Curation.domainCap(docs, k.toInt,
          strArg(2, "domain_col", "source"), strArg(3, "id_col", "doc_id"),
          strArg(4, "text_col", "text"))
          .queryExecution.logical
      }))

    ext.injectTableFunction((
      FunctionIdentifier("mixture_budget"),
      new ExpressionInfo(
        graft.operators.Curation.getClass.getName,
        null,
        "mixture_budget",
        "mixture_budget(table, budgets_map, default_budget[, strata_col, " +
          "id_col, weight_col]) - keep each stratum's hash-order prefix up " +
          "to its token budget (map('src', tokens, ...); strata absent from " +
          "the map get default_budget). Deterministic, replayable.",
        "", "", "", "table_funcs", "1.0.0", "", "built-in"),
      (exprs: Seq[Expression]) => {
        if (exprs.length < 3 || exprs.length > 6) analysisError(
          s"mixture_budget takes 3 to 6 arguments, got ${exprs.length}",
          exprs.headOption.getOrElse(Literal(null)))
        val df = tableOf("mixture_budget", exprs.head)
        val budgets = foldStringLongMap("mixture_budget", "budgets_map", exprs(1))
        val dflt = foldLong("mixture_budget", "default_budget", exprs(2))
        // anchor the error to the argument the offending value came
        // from (a negative map entry points at the map even when the
        // default is also negative)
        budgets.map(_._2).find(_ < 0).foreach { b =>
          analysisError(
            s"mixture_budget: budgets are token counts and must be >= 0, got $b",
            exprs(1))
        }
        if (dflt < 0) analysisError(
          s"mixture_budget: budgets are token counts and must be >= 0, got $dflt",
          exprs(2))
        def strArg(i: Int, what: String, default: String) =
          if (exprs.length > i) foldString("mixture_budget", what, exprs(i))
          else default
        graft.operators.Curation.mixtureByBudget(df, budgets, dflt,
          strArg(3, "strata_col", "source"), strArg(4, "id_col", "doc_id"),
          strArg(5, "weight_col", "n_tokens"))
          .queryExecution.logical
      }))

    ext.injectTableFunction((
      FunctionIdentifier("pack"),
      new ExpressionInfo(
        graft.operators.Curation.getClass.getName,
        null,
        "pack",
        "pack(table, budget_tokens[, strata_col, id_col, weight_col]) - " +
          "assign each row a pack_id so every pack holds ~budget_tokens " +
          "of weight within its stratum, in the same deterministic hash " +
          "order as mixture_budget (the context-window batching step)",
        "", "", "", "table_funcs", "1.0.0", "", "built-in"),
      (exprs: Seq[Expression]) => {
        if (exprs.length < 2 || exprs.length > 5) analysisError(
          s"pack takes 2 to 5 arguments, got ${exprs.length}",
          exprs.headOption.getOrElse(Literal(null)))
        val df = tableOf("pack", exprs.head)
        val budget = foldLong("pack", "budget_tokens", exprs(1))
        if (budget < 1) analysisError(
          s"pack: budget_tokens must be >= 1, got $budget", exprs(1))
        def strArg(i: Int, what: String, default: String) =
          if (exprs.length > i) foldString("pack", what, exprs(i))
          else default
        graft.operators.Curation.packByBudget(df, budget,
          strArg(2, "strata_col", "source"), strArg(3, "id_col", "doc_id"),
          strArg(4, "weight_col", "n_tokens"))
          .queryExecution.logical
      }))

    ext.injectTableFunction((
      FunctionIdentifier("substring_dedup"),
      new ExpressionInfo(
        graft.operators.NearDup.getClass.getName,
        null,
        "substring_dedup",
        "substring_dedup(table[, id_col, text_col, n, min_docs]) - rewrite " +
          "each doc with cross-doc duplicated n-gram spans removed except " +
          "on the canonical (min-id) doc (Lee et al. substring dedup)",
        "", "", "", "table_funcs", "1.0.0", "", "built-in"),
      (exprs: Seq[Expression]) => {
        if (exprs.isEmpty || exprs.length > 5) analysisError(
          s"substring_dedup takes 1 to 5 arguments, got ${exprs.length}",
          exprs.headOption.getOrElse(Literal(null)))
        val docs = tableOf("substring_dedup", exprs.head)
        def strArg(i: Int, what: String, default: String) =
          if (exprs.length > i) foldString("substring_dedup", what, exprs(i))
          else default
        val n =
          if (exprs.length > 3) foldLong("substring_dedup", "n", exprs(3))
          else graft.operators.NearDup.ShingleN.toLong
        if (n < 1 || n > 64) analysisError(
          s"substring_dedup: n must be in [1, 64], got $n", exprs(3))
        val minDocs =
          if (exprs.length > 4) foldLong("substring_dedup", "min_docs", exprs(4))
          else 2L
        if (minDocs < 2 || minDocs > Int.MaxValue) analysisError(
          s"substring_dedup: min_docs must be >= 2, got $minDocs", exprs(4))
        graft.operators.NearDup.substringDedup(docs,
          strArg(1, "id_col", "doc_id"), strArg(2, "text_col", "text"),
          n.toInt, minDocs.toInt)
          .queryExecution.logical
      }))

    ext.injectTableFunction((
      FunctionIdentifier("winnow_pairs"),
      new ExpressionInfo(
        graft.operators.TextAnalysis.getClass.getName,
        null,
        "winnow_pairs",
        "winnow_pairs(table[, id_col, text_col]) - partial-overlap candidate " +
          "pairs from winnowed fingerprints (the MOSS shape): doc_a, doc_b, " +
          "shared_fps over the ~2/(w+1) selected k-gram subset",
        "", "", "", "table_funcs", "1.0.0", "", "built-in"),
      (exprs: Seq[Expression]) => {
        if (exprs.isEmpty || exprs.length > 3) analysisError(
          s"winnow_pairs takes 1 to 3 arguments, got ${exprs.length}",
          exprs.headOption.getOrElse(Literal(null)))
        val docs = tableOf("winnow_pairs", exprs.head)
        val idCol =
          if (exprs.length > 1) foldString("winnow_pairs", "id_col", exprs(1))
          else "doc_id"
        val textCol =
          if (exprs.length > 2) foldString("winnow_pairs", "text_col", exprs(2))
          else "text"
        graft.operators.TextAnalysis.winnowPairs(docs, idCol, textCol)
          .queryExecution.logical
      }))

    ext.injectTableFunction((
      FunctionIdentifier("phash_pairs"),
      new ExpressionInfo(
        graft.operators.Multimodal.getClass.getName,
        null,
        "phash_pairs",
        "phash_pairs(table[, id_col, bin_col, bands, max_hamming]) - exact " +
          "perceptual-hash near-duplicate pairs of binary payloads within " +
          "max_hamming signature bits (band-PAIR candidates; exact only " +
          "while bands - max_hamming >= 2)",
        "", "", "", "table_funcs", "1.0.0", "", "built-in"),
      (exprs: Seq[Expression]) => {
        if (exprs.isEmpty || exprs.length > 5) analysisError(
          s"phash_pairs takes 1 to 5 arguments, got ${exprs.length}",
          exprs.headOption.getOrElse(Literal(null)))
        val df = tableOf("phash_pairs", exprs.head)
        def strArg(i: Int, what: String, default: String) =
          if (exprs.length > i) foldString("phash_pairs", what, exprs(i))
          else default
        val bands =
          if (exprs.length > 3) foldLong("phash_pairs", "bands", exprs(3))
          else graft.operators.Multimodal.PHashBands.toLong
        if (bands < 2 || bands > 64) analysisError(
          s"phash_pairs: bands must be in [2, 64], got $bands", exprs(3))
        val maxHamming =
          if (exprs.length > 4) foldLong("phash_pairs", "max_hamming", exprs(4))
          else graft.operators.Multimodal.PHashMaxHamming.toLong
        if (maxHamming < 0) analysisError(
          s"phash_pairs: max_hamming must be >= 0, got $maxHamming", exprs(4))
        // the operator's own exactness precondition, surfaced as a
        // positioned analysis error instead of a builder-time require
        if (bands - maxHamming < 2) analysisError(
          s"phash_pairs: exact only when bands - max_hamming >= 2, " +
            s"got bands=$bands, max_hamming=$maxHamming",
          exprs(math.min(exprs.length - 1, 4)))
        graft.operators.Multimodal.pHashPairs(df,
          strArg(1, "id_col", "doc_id"), strArg(2, "bin_col", "payload"),
          bands.toInt, maxHamming.toInt)
          .queryExecution.logical
      }))

    ext.injectTableFunction((
      FunctionIdentifier("bfs"),
      new ExpressionInfo(
        graft.operators.Graph.getClass.getName,
        null,
        "bfs",
        "bfs(edges_table, seeds_table[, max_hops, src_col, dst_col, seed_id_col]) - " +
          "frontier BFS distances (id, dist) from the seed set over the " +
          "edge list, up to max_hops",
        "", "", "", "table_funcs", "1.0.0", "", "built-in"),
      (exprs: Seq[Expression]) => {
        if (exprs.length < 2 || exprs.length > 6) analysisError(
          s"bfs takes 2 to 6 arguments, got ${exprs.length}",
          exprs.headOption.getOrElse(Literal(null)))
        val edges = tableOf("bfs", exprs.head)
        val seeds = tableOf("bfs", exprs(1))
        val maxHops =
          if (exprs.length > 2) foldLong("bfs", "max_hops", exprs(2))
          else 4L
        // cap the DRIVER loop: each hop is two shuffle joins built at
        // analysis time — an unbounded literal would let one SQL call
        // schedule thousands of stages
        if (maxHops < 1 || maxHops > 1000) analysisError(
          s"bfs: max_hops must be in [1, 1000], got $maxHops", exprs(2))
        def strArg(i: Int, what: String, default: String) =
          if (exprs.length > i) foldString("bfs", what, exprs(i))
          else default
        graft.operators.Graph.bfs(edges, seeds, maxHops.toInt,
          strArg(3, "src_col", "src"), strArg(4, "dst_col", "dst"),
          strArg(5, "seed_id_col", "id"))
          .queryExecution.logical
      }))

    ext.injectTableFunction((
      FunctionIdentifier("ann_search"),
      new ExpressionInfo(
        graft.operators.Embeddings.getClass.getName,
        null,
        "ann_search",
        "ann_search(queries_table, icents_table, pcents_table, cells_table, " +
          "codes_table[, k, nprobe, m, id_col, vec_col]) - IVF-PQ top-k " +
          "search of the query batch against a frozen/maintained index: " +
          "coarse centroids + PQ codebooks + per-id cell assignments + PQ " +
          "codes, PQ-code (ADC) ranked; only the query batch touches raw " +
          "vectors; m must match the codebook build",
        "", "", "", "table_funcs", "1.0.0", "", "built-in"),
      (exprs: Seq[Expression]) => {
        if (exprs.length < 5 || exprs.length > 10) analysisError(
          s"ann_search takes 5 to 10 arguments, got ${exprs.length}",
          exprs.headOption.getOrElse(Literal(null)))
        val queries = tableOf("ann_search", exprs.head)
        val icents = tableOf("ann_search", exprs(1))
        val pcents = tableOf("ann_search", exprs(2))
        val cells = tableOf("ann_search", exprs(3))
        val codes = tableOf("ann_search", exprs(4))
        val k =
          if (exprs.length > 5) foldLong("ann_search", "k", exprs(5)) else 3L
        if (k < 1) analysisError(
          s"ann_search: k must be >= 1, got $k", exprs(5))
        val nprobe =
          if (exprs.length > 6) foldLong("ann_search", "nprobe", exprs(6))
          else 1L
        if (nprobe < 1) analysisError(
          s"ann_search: nprobe must be >= 1, got $nprobe", exprs(6))
        // m splits the QUERY vectors into the same subspaces the
        // codebook was built with — it must match the build dial (the
        // codes/pcents tables join by sub, so a mismatch surfaces as
        // empty or partial per-sub joins, not an error: validate here)
        val m =
          if (exprs.length > 7) foldLong("ann_search", "m", exprs(7))
          else graft.operators.Embeddings.PqSubspaces.toLong
        if (m < 1 || m > 4096) analysisError(
          s"ann_search: m must be in [1, 4096], got $m", exprs(7))
        def strArg(i: Int, what: String, default: String) =
          if (exprs.length > i) foldString("ann_search", what, exprs(i))
          else default
        graft.operators.Embeddings.annIvfPqServe(queries, icents, pcents,
          cells, codes, k.toInt, m.toInt,
          idCol = strArg(8, "id_col", "vec_id"),
          vecCol = strArg(9, "vec_col", "embedding"),
          nprobe = nprobe.toInt)
          .queryExecution.logical
      }))

    ext.injectTableFunction((
      FunctionIdentifier("ann_search_refined"),
      new ExpressionInfo(
        graft.operators.Embeddings.getClass.getName,
        null,
        "ann_search_refined",
        "ann_search_refined(queries_table, corpus_table, icents_table, " +
          "pcents_table, cells_table, codes_table[, k, nprobe, refine, m, " +
          "id_col, vec_col]) - ann_search + exact rerank: the PQ-ranked " +
          "top-refine shortlist per query re-scored by exact int64 squared " +
          "L2 against the corpus vectors (bounded id-equijoins, never a " +
          "corpus scan); final top-k in exact order (sqdist)",
        "", "", "", "table_funcs", "1.0.0", "", "built-in"),
      (exprs: Seq[Expression]) => {
        if (exprs.length < 6 || exprs.length > 12) analysisError(
          s"ann_search_refined takes 6 to 12 arguments, got ${exprs.length}",
          exprs.headOption.getOrElse(Literal(null)))
        val queries = tableOf("ann_search_refined", exprs.head)
        val corpus = tableOf("ann_search_refined", exprs(1))
        val icents = tableOf("ann_search_refined", exprs(2))
        val pcents = tableOf("ann_search_refined", exprs(3))
        val cells = tableOf("ann_search_refined", exprs(4))
        val codes = tableOf("ann_search_refined", exprs(5))
        val k =
          if (exprs.length > 6) foldLong("ann_search_refined", "k", exprs(6))
          else 3L
        if (k < 1) analysisError(
          s"ann_search_refined: k must be >= 1, got $k", exprs(6))
        val nprobe =
          if (exprs.length > 7) foldLong("ann_search_refined", "nprobe", exprs(7))
          else 1L
        if (nprobe < 1) analysisError(
          s"ann_search_refined: nprobe must be >= 1, got $nprobe", exprs(7))
        val refine =
          if (exprs.length > 8) foldLong("ann_search_refined", "refine", exprs(8))
          else 8 * k
        // the operator's own precondition, surfaced as a positioned
        // analysis error instead of a builder-time require
        if (refine < k) analysisError(
          s"ann_search_refined: refine ($refine) must be >= k ($k)",
          exprs(math.min(exprs.length - 1, 8)))
        val m =
          if (exprs.length > 9) foldLong("ann_search_refined", "m", exprs(9))
          else graft.operators.Embeddings.PqSubspaces.toLong
        if (m < 1 || m > 4096) analysisError(
          s"ann_search_refined: m must be in [1, 4096], got $m", exprs(9))
        def strArg(i: Int, what: String, default: String) =
          if (exprs.length > i) foldString("ann_search_refined", what, exprs(i))
          else default
        graft.operators.Embeddings.annIvfPqServeRefined(queries, corpus,
          icents, pcents, cells, codes, k.toInt, m.toInt,
          idCol = strArg(10, "id_col", "vec_id"),
          vecCol = strArg(11, "vec_col", "embedding"),
          nprobe = nprobe.toInt, refine = refine.toInt)
          .queryExecution.logical
      }))
  }
}
