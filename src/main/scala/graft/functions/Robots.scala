package graft.functions

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** robots.txt politeness layer (beyond-parity) — the screen between the
  * outlink frontier ([[Urls.linkGraph]]) and the fetcher: parse each
  * host's robots body into Allow/Disallow/Crawl-delay rules, then screen
  * candidate URLs with the classic longest-prefix-wins resolution.
  *
  * Grammar scope (the 1994 REP core as standardized by RFC 9309 §2):
  * `User-agent` lines open groups (adjacent user-agent lines share one
  * group); `Allow:`/`Disallow:`/`Crawl-delay:` lines bind to the group
  * they follow; only the wildcard group (`User-agent: *`) applies here —
  * named-agent groups are parsed and skipped. `#` comments strip to end
  * of line; header names are case-insensitive; empty Allow/Disallow
  * values are no-ops; rules before any User-agent line are ignored.
  * Matching implements RFC 9309 §2.2.2–§2.2.3 in full: rule values and
  * paths are compared PERCENT-ENCODING-NORMALIZED (both sides reduce
  * to their decoded octet sequence — see [[canonHex]] — so `%c3%a9`,
  * `%C3%A9` and a raw `é` all match each other); a rule value is a
  * path-prefix pattern where `*` matches any octet sequence and a
  * TRAILING `$` anchors end-of-path (`$` elsewhere is a literal octet);
  * resolution picks the longest matching rule value (octet length of
  * the raw value, wildcards included — the reference REP library's
  * rule), Allow wins a length tie, no match ⇒ allowed. Wildcard-free
  * rules take the cheap `startswith` path (on canonical hex);
  * wildcard rules compile once per rule (on the tiny per-host rules
  * frame, not per frontier row) to a hex-domain regex — the [0-9A-F]
  * alphabet needs no escaping, `*`→`(?:..)*`, `^` start anchor.
  *
  * Scale shape: parsing is per-host window work over line positions
  * (robots bodies are small by definition — RFC 9309 requires parsers to
  * honor only the first 500 KiB); the screen aggregates rules to ONE
  * array row per host and hash-joins that tiny frame to the frontier
  * (broadcast at any real scale), so the per-URL decision is a per-row
  * array reduction — no explode-join blowup on the frontier side. */
object Robots {

  val DirectiveRe: String = "^([A-Za-z][A-Za-z-]*)\\s*:"
  val ValueRe: String = "^[A-Za-z][A-Za-z-]*\\s*:\\s*(.*)$"

  /** Parse robots bodies into per-host wildcard-group rules.
    * Input: one row per host — (hostCol, bodyCol).
    * Output: (host, prefix, is_allow INT 0/1) — one row per effective
    * Allow/Disallow rule of the `*` group. */
  def parseRules(robots: DataFrame, hostCol: String, bodyCol: String): DataFrame = {
    val lines = linesOf(robots, hostCol, bodyCol)
    val starRules = lines
      .filter(col("_in_star") && (col("_dir") === "allow" ||
        col("_dir") === "disallow") && col("_val") =!= "")
    starRules.select(col(hostCol).as("host"), col("_val").as("prefix"),
      when(col("_dir") === "allow", 1).otherwise(0).as("is_allow"))
  }

  /** Per-host Crawl-delay of the `*` group, in whole seconds; when a host
    * declares several (multiple star groups), the MAXIMUM applies — the
    * politest reading. Hosts without a parseable delay are absent. */
  def crawlDelays(robots: DataFrame, hostCol: String, bodyCol: String): DataFrame =
    linesOf(robots, hostCol, bodyCol)
      .filter(col("_in_star") && col("_dir") === "crawl-delay" &&
        col("_val").rlike("^[0-9]+$"))
      .groupBy(col(hostCol).as("host"))
      .agg(max(col("_val").cast("long")).as("crawl_delay_s"))

  /** Sitemap pointers: `Sitemap:` lines are GROUP-INDEPENDENT (RFC 9309
    * §2.3: a non-group record — it applies regardless of which
    * user-agent group surrounds it), so they collect from anywhere in
    * the file, including before the first group or inside a named-agent
    * group the rule parser skips. One row per declaration. */
  def sitemaps(robots: DataFrame, hostCol: String, bodyCol: String): DataFrame =
    linesOf(robots, hostCol, bodyCol)
      .filter(col("_dir") === "sitemap" && col("_val") =!= "")
      .select(col(hostCol).as("host"), col("_val").as("sitemap_url"))

  /** Shared line/group scan: split the body into lines, strip comments,
    * parse directive/value, and resolve RFC 9309 groups — a User-agent
    * line whose predecessor is not one STARTS a group, adjacent
    * User-agent lines share the group, and a group is "star" iff any of
    * its User-agent values is `*`. Window math over line position —
    * per-host frames are bounded by the body size. */
  private def linesOf(robots: DataFrame, hostCol: String, bodyCol: String): DataFrame = {
    val raw = robots.select(col(hostCol),
      posexplode(split(col(bodyCol), "\r?\n")).as(Seq("_pos", "_raw")))
    val parsed = raw
      .withColumn("_line", trim(regexp_replace(col("_raw"), "#.*", "")))
      .withColumn("_dir", lower(regexp_extract(col("_line"), DirectiveRe, 1)))
      .withColumn("_val", trim(regexp_extract(col("_line"), ValueRe, 1)))
    val w = Window.partitionBy(col(hostCol)).orderBy(col("_pos"))
    val grouped = parsed
      .withColumn("_is_ua", (col("_dir") === "user-agent").cast("int"))
      .withColumn("_starts",
        (col("_is_ua") === 1 &&
          coalesce(lag(col("_is_ua"), 1).over(w), lit(0)) === 0).cast("int"))
      .withColumn("_gid", sum(col("_starts")).over(w))
    val starGroups = grouped
      .filter(col("_is_ua") === 1 && col("_val") === "*")
      .select(col(hostCol), col("_gid")).distinct()
      .withColumn("_star", lit(true))
    grouped.join(starGroups, Seq(hostCol, "_gid"), "left_outer")
      .withColumn("_in_star",
        coalesce(col("_star"), lit(false)) && col("_gid") > 0)
  }

  /** Canonical percent-encoding-normalized comparison form (RFC 9309
    * §2.2.2): the UPPERCASE HEX of the string's decoded octet sequence —
    * every `%XX` triple contributes the octet XX, every other character
    * contributes its UTF-8 octets. One representation unifies the three
    * normalizations the RFC asks for at once: hex-digit case (`%c3` ≡
    * `%C3`), encoded-vs-unreserved (`%41` ≡ `A`), and raw-UTF-8-vs-
    * encoded (`é` ≡ `%C3%A9`) — and because the result alphabet is
    * [0-9A-F] only, wildcard rules compile to regexes with NO escaping.
    * A `%` not followed by two hex digits is a literal octet 0x25.
    * Matching in the hex domain is byte-aligned: prefixes are
    * even-length and `*` becomes `(?:..)*` (whole octets). */
  def canonHex(c: org.apache.spark.sql.Column): org.apache.spark.sql.Column = {
    val segs = split(c, "%", -1)
    concat(
      upper(hex(encode(element_at(segs, 1), "UTF-8"))),
      array_join(transform(slice(segs, lit(2), size(segs)), seg =>
        when(seg.rlike("^[0-9A-Fa-f]{2}"),
          concat(upper(substring(seg, 1, 2)),
            upper(hex(encode(substring(seg, 3, Int.MaxValue), "UTF-8")))))
          .otherwise(concat(lit("25"),
            upper(hex(encode(seg, "UTF-8")))))), ""))
  }

  /** Screen an outlink frontier against parsed rules: for each URL,
    * the longest rule prefix of its host that prefixes the URL path —
    * both sides compared PERCENT-ENCODING-NORMALIZED per RFC 9309
    * §2.2.2 (see [[canonHex]]) — decides (Allow wins a tie); no
    * matching rule ⇒ allowed. Hosts with no robots rules allow
    * everything. Rule values carry RFC 9309 §2.2.3 wildcards: `*`
    * matches any sequence, a trailing `$` anchors end-of-path;
    * specificity is the RAW value's OCTET length (RFC 9309 "most
    * octets"; wildcards and percent escapes count as written).
    *
    * The rules aggregate to one array row per host (bounded by body
    * size) and broadcast to the frontier; the decision is a per-row
    * lexicographic `array_max` over (prefix octets, is_allow) — struct
    * ordering gives longest-then-allow exactly. Wildcard-free rules
    * (the overwhelming majority in real files) match via `startswith`
    * on the canonical hex; only wildcard rules pay the regex.
    *
    * Output: frontier columns + (host, path, allowed BOOLEAN,
    * matched_prefix STRING nullable — the raw rule value). */
  def screen(frontier: DataFrame, rules: DataFrame, urlCol: String): DataFrame = {
    // wildcard compilation rides the RULES frame (rows = rules, tiny),
    // never the frontier: a trailing `$` anchors, segments between `*`s
    // canonicalize to hex (alphabet [0-9A-F] — nothing to escape),
    // `*` becomes `(?:..)*` (any whole octets), `^` pins the start.
    val anchored = endswith(col("prefix"), lit("$"))
    val rxBody = when(anchored,
        expr("substring(prefix, 1, length(prefix) - 1)"))
      .otherwise(col("prefix"))
    val compiled = rules
      .withColumn("wild", col("prefix").contains("*") || anchored)
      .withColumn("pfx_hex", canonHex(col("prefix")))
      .withColumn("rx", concat(lit("^"),
        array_join(transform(split(rxBody, "\\*", -1), s => canonHex(s)),
          "(?:..)*"),
        when(anchored, lit("$")).otherwise(lit(""))))
    val byHost = compiled.groupBy(col("host"))
      .agg(collect_list(struct(col("prefix"), col("pfx_hex"),
        col("is_allow"), col("wild"), col("rx"))).as("_rules"))
    val withPath = frontier
      .withColumn("host", Urls.host(col(urlCol)))
      .withColumn("path", {
        val p = regexp_extract(
          regexp_extract(col(urlCol), Urls.RestRe, 1), "^([^?]*)", 1)
        when(p === "", "/").otherwise(p)
      })
    withPath.join(broadcast(byHost), Seq("host"), "left_outer")
      .withColumn("_ph", canonHex(col("path")))
      .withColumn("_m", filter(coalesce(col("_rules"),
          array().cast(
            "array<struct<prefix:string,pfx_hex:string,is_allow:int," +
              "wild:boolean,rx:string>>")),
        r => when(r.getField("wild"),
            regexp_like(col("_ph"), r.getField("rx")))
          .otherwise(startswith(col("_ph"), r.getField("pfx_hex")))))
      .withColumn("_best", array_max(transform(col("_m"),
        r => struct(octet_length(r.getField("prefix")).as("l"),
          r.getField("is_allow").as("a"),
          r.getField("prefix").as("p")))))
      .withColumn("allowed",
        size(col("_m")) === 0 || col("_best").getField("a") === 1)
      .withColumn("matched_prefix", col("_best").getField("p"))
      .drop("_rules", "_m", "_best", "_ph")
  }

  /** Per-host politeness report over a screened frontier: allowed and
    * blocked URL counts plus the host's effective crawl delay (0 when
    * the host declares none). One hash aggregation. */
  def hostReport(screened: DataFrame, delays: DataFrame): DataFrame =
    screened.groupBy(col("host"))
      .agg(
        count(when(col("allowed"), 1)).as("n_allowed"),
        count(when(!col("allowed"), 1)).as("n_blocked"))
      .join(delays, Seq("host"), "left_outer")
      .withColumn("crawl_delay_s", coalesce(col("crawl_delay_s"), lit(0L)))

  /** Fetch schedule — the politeness layer's OUTPUT artifact: each
    * allowed URL gets its position in the host's fetch queue
    * (deterministic URL order) and the earliest start offset respecting
    * the host's crawl delay (`seq · delay`). One window per host — the
    * partition key IS the politeness domain, so the sort is local to
    * each host's own queue and the plan scales with hosts, not with the
    * frontier. Blocked URLs never enter the queue. `urlCol` names the
    * frontier's URL column, mirroring [[screen]]'s parameterization —
    * the two form a pipeline and must agree.
    * Output: (host, <urlCol>, fetch_seq, offset_s). */
  def fetchSchedule(screened: DataFrame, delays: DataFrame,
      urlCol: String = "url"): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("host")).orderBy(col(urlCol))
    screened.filter(col("allowed"))
      .join(delays, Seq("host"), "left_outer")
      .withColumn("crawl_delay_s", coalesce(col("crawl_delay_s"), lit(0L)))
      .withColumn("fetch_seq", (row_number().over(w) - 1).cast("long"))
      .select(col("host"), col(urlCol), col("fetch_seq"),
        (col("fetch_seq") * col("crawl_delay_s")).as("offset_s"))
  }
}
