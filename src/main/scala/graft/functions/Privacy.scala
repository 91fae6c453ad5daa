package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Privacy-risk profiling for training corpora (beyond-parity): before a
  * corpus ships to training, quantify re-identification risk from its
  * released metadata — k-anonymity (Sweeney 2002) over the quasi-identifier
  * columns, plus distinct-l diversity (Machanavalli et al. 2007) of a
  * sensitive attribute inside each quasi-identifier group.
  *
  * A row is k-anonymous if at least k−1 other rows share its full
  * quasi-identifier tuple; a group is l-diverse if the sensitive attribute
  * takes ≥ l distinct values inside it. Groups failing either bound are
  * the ones to generalize (coarsen a bucket), suppress, or drop before
  * release — the report names them directly.
  *
  * Scale shape: one hash aggregation over the quasi tuple (map-side
  * partial on count; count_distinct adds the standard distinct expand but
  * only over the grouped frame), output is |distinct quasi tuples| rows —
  * corpus-size-independent for bounded-cardinality identifiers. No
  * windows, no joins, no driver-side state.
  */
object Privacy {

  /** Per-quasi-group anonymity report: (quasiCols…, group_n, l_distinct,
    * at_risk) where at_risk = 1 iff group_n < k OR l_distinct < l.
    * `sensitive` is the attribute whose within-group diversity protects
    * against homogeneity attacks (pass a constant column and l = 1 to run
    * pure k-anonymity). */
  def kAnonymityReport(df: DataFrame, quasiCols: Seq[String],
                       sensitive: String, k: Long, l: Long): DataFrame = {
    require(quasiCols.nonEmpty, "quasiCols must be non-empty")
    df.groupBy(quasiCols.map(col): _*)
      .agg(count(lit(1)).as("group_n"),
        count_distinct(col(sensitive)).as("l_distinct"))
      .withColumn("at_risk",
        (col("group_n") < k || col("l_distinct") < l).cast("long"))
  }

  /** Right-to-be-forgotten IMPACT report: for a subject delete list, how
    * many rows in each declared table reference a listed subject — the
    * sizing pass a GDPR/CCPA erasure pipeline runs before rewriting
    * files (at parquet scale, deletes are partition rewrites; knowing
    * blast radius per table decides rewrite vs tombstone).
    *
    * Each table is ONE left join against the DISTINCT subject list
    * (row-preserving by construction) + one conditional-count aggregate
    * — the fkIntegrity shape; the subject list broadcasts. Output:
    * (table_name, n_rows, n_affected, affected_ppm), |tables| rows. */
  def deleteImpact(tables: Seq[(String, DataFrame, String)],
                   subjects: DataFrame, subjectCol: String): DataFrame = {
    val subj = subjects.select(col(subjectCol).as("_v")).distinct()
    tables.map { case (name, df, keyCol) =>
      df.select(col(keyCol).as("_k"))
        .join(broadcast(subj), col("_k") === col("_v"), "left")
        .agg(count(lit(1)).as("n_rows"),
          count(when(col("_v").isNotNull, 1)).as("n_affected"))
        .select(lit(name).as("table_name"), col("n_rows"),
          col("n_affected"),
          when(col("n_rows") > 0,
            Sampling.intDiv(
              col("n_affected").cast("decimal(38,0)") * lit(1000000L),
              col("n_rows").cast("decimal(38,0)")))
            .otherwise(lit(0L)).as("affected_ppm"))
    }.reduce(_ unionAll _)
  }

  /** Deterministic pseudonymization of identifier columns — the
    * de-identification pass a corpus export runs before leaving the trust
    * boundary: every identifier is replaced by a stable salted token, so
    * referential integrity (joins and group-bys across tables exported
    * with the SAME salt) survives while the raw id does not.
    *
    * Token = md5 hex of `salt ⊕ id` (the U+0001 separator prevents
    * (salt="a", id="bc") / (salt="ab", id="c") ambiguity) — the same
    * cross-engine md5 kernel as `Sampling.stableBucket`, so any SQL
    * engine holding the salt recomputes identical tokens. Default keeps
    * 15 hex chars (60 bits: birthday collision odds ~n²/2⁶¹ — negligible
    * to ~10⁸ ids); `fullDigest` keeps all 32 for larger populations.
    *
    * THREAT MODEL: this is keyed hashing for pseudonymization (GDPR
    * art. 4(5)), not anonymization — an adversary holding the salt, or a
    * small enumerable id space, can re-identify. Use a high-entropy
    * secret salt and rotate per export.
    *
    * Pure per-row codegen'd projection: no shuffle, no UDF, scan-bound at
    * any corpus size. */
  def pseudonymize(df: DataFrame, cols: Seq[String], salt: String,
                   fullDigest: Boolean = false): DataFrame = {
    require(cols.nonEmpty, "no columns to pseudonymize")
    cols.foldLeft(df) { (d, c) =>
      // concat, NOT concat_ws: it null-propagates, so a NULL id stays
      // NULL in the export instead of collapsing every null row onto the
      // constant md5(salt) pseudo-identity (and it matches the SQL twin
      // `salt || chr(1) || id`, which null-propagates too)
      val tok = md5(concat(lit(salt), lit("\u0001"), col(c).cast("string")))
      d.withColumn(c, if (fullDigest) tok else substring(tok, 1, 15))
    }
  }

  /** Inverse-CDF lookup table for the DISCRETE Laplace (two-sided
    * geometric) mechanism at ε = epsPpm/10⁶, sensitivity 1 — the noise
    * distribution of Ghosh–Roughgarden–Sundararajan 2009, which is
    * ε-differentially-private for counting queries and needs no
    * floating-point noise at release time: P(k) ∝ α^|k| with
    * α = e^(−ε), inverted into integer thresholds on the 48-bit hash
    * space. Returns (u48UpperBound, noise) rows with strictly increasing
    * bounds ending at 2⁴⁸; support truncates where the two-sided tail
    * drops below 2⁻⁴⁸ (below the resolution of the 48-bit draw).
    *
    * The table is computed driver-side ONCE (powers by repeated
    * multiplication, the lshTuningCurve discipline) and embedded as
    * LITERALS in both the engine plan and the oracle SQL — the release
    * is a pure deterministic function of (key, salt), so both engines
    * agree bit-for-bit and a re-release under a fresh salt is a fresh
    * draw (each salt spends its own ε budget; account accordingly). */
  def dpNoiseTable(epsPpm: Long): Seq[(Long, Long)] = {
    require(epsPpm >= 50000 && epsPpm <= 10000000,
      s"eps = $epsPpm ppm outside the supported [0.05, 10] range")
    val alpha = math.exp(-epsPpm.toDouble / 1e6)
    val p0 = (1 - alpha) / (1 + alpha)
    val maxU = 1L << 48
    // smallest K with two-sided tail 2·p0·α^(K+1)/(1−α) < 2⁻⁴⁸, capped
    // defensively (ε ≥ 0.05 keeps K ≤ ~1600)
    var k = 0
    var tail = 1.0 - p0
    while (tail * 2 / (1 - alpha) > math.pow(2.0, -48) && k < 2000) {
      k += 1
      tail *= alpha
    }
    val ks = -k to k
    // P(j) by repeated multiplication from p0 outward
    val pmf = ks.map { j =>
      var p = p0
      var i = 0
      while (i < math.abs(j)) { p *= alpha; i += 1 }
      p
    }
    val total = pmf.sum
    var cum = 0.0
    val rows = ks.zip(pmf).map { case (j, p) =>
      cum += p / total
      (math.min(maxU, math.round(cum * maxU)), j.toLong)
    }
    // keep only rows that carve a NON-EMPTY u-interval: extreme-tail
    // noises whose probability rounds below the 48-bit resolution are
    // dropped (they were unreachable anyway — forcing them to width-1
    // slots would instead push bounds past 2⁴⁸ and break monotonicity,
    // the bug the PrivacySpec shape test caught)
    var lo = 0L
    val fixed = Vector.newBuilder[(Long, Long)]
    rows.foreach { case (t, j) =>
      if (t > lo) { fixed += ((t, j)); lo = t }
    }
    val out = fixed.result()
    if (lo < maxU) out :+ ((maxU, out.last._2)) else out
  }

  /** ε-DP count release: group by `keyCols`, add discrete-Laplace noise
    * drawn deterministically by inverse-CDF lookup of the stable 48-bit
    * md5 of (key, salt), clamp at 0 (post-processing preserves DP).
    * True counts never appear in the output. One hash aggregation + a
    * per-row literal lookup chain — no extra shuffle (with a `domain`,
    * plus one broadcast-able outer join against it).
    *
    * PRIVACY CONTRACT — the key SET is released as-is, so the guarantee
    * holds only when the released keys are public knowledge:
    *  - Pass `domain` (the fixed, public key universe — e.g. an enum
    *    dimension table) and the release emits EXACTLY the domain's
    *    keys: absent keys get a noised ZERO count, so presence/absence
    *    of any individual's rows cannot change which keys appear. This
    *    is the mode to use whenever the key domain is knowable up
    *    front. Keys in the data but outside `domain` are NOT released
    *    (the domain defines the release, by construction public).
    *  - With `domain = None`, rows are emitted only for keys present in
    *    the data — removing the sole contributor of a key removes that
    *    key's row entirely, which distinguishes adjacent datasets with
    *    certainty. Only use this mode when the key column itself is
    *    public/non-sensitive (e.g. a fixed event-type enum where every
    *    value is known to occur).
    * Independently of the mode, the table's 2⁻⁴⁸ tail truncation makes
    * the mechanism (ε, δ≈2⁻⁴⁸)-DP rather than pure ε-DP — the extreme
    * tail of the geometric is unreachable from the 48-bit draw. */
  def dpNoisyCounts(df: DataFrame, keyCols: Seq[String], salt: String,
                    epsPpm: Long, domain: Option[DataFrame] = None): DataFrame = {
    require(keyCols.nonEmpty, "no grouping keys")
    val table = dpNoiseTable(epsPpm)
    val observed = df.groupBy(keyCols.map(col): _*)
      .agg(count(lit(1)).as("_n"))
    // left join FROM the public domain: every domain key gets a row
    // (absent → noised zero), keys outside the domain are dropped
    val counts = domain.fold(observed) { dom =>
      dom.select(keyCols.map(col): _*).distinct()
        .join(observed, keyCols, "left")
        .select(keyCols.map(col) :+
          coalesce(col("_n"), lit(0L)).as("_n"): _*)
    }
    //  separators: ("a","bc") and ("ab","c") must draw different
    // noise (the pseudonymize separator lesson); concat (not concat_ws)
    // so a NULL key column nulls u and the noise falls to the table's
    // last row deterministically rather than colliding groups
    val key = concat(
      keyCols.flatMap(c => Seq(col(c).cast("string"), lit("\u0001"))) :+
        lit(salt): _*)
    val u = Dedup.Md5Hasher.prefixLong(key, 12)
    val noise = table.init
      .foldLeft(Option.empty[Column]) { case (acc, (t, j)) =>
        Some(acc.fold(when(u < t, j))(_.when(u < t, j)))
      }
      .fold(lit(table.last._2))(_.otherwise(table.last._2))
    counts.select(keyCols.map(col) :+
      greatest(col("_n") + noise, lit(0L)).as("noisy_count"): _*)
  }
}
