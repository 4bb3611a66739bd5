package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Corpus-composition ("data mixing") operators for training-data
  * pipelines: measure what a corpus is made of, then deterministically
  * rebalance it. Neither exists in the reference (it has no document
  * surface); both are first-class operators of the extended engine
  * (SURVEY.md §2.7b).
  */
object CorpusMix {

  /** Composition by (source, language): doc count, token count, and the
    * cell's share of all corpus tokens in parts-per-million. One
    * shuffle reduces the corpus to the tiny (sources × languages) group
    * frame; the grand total is a windowed sum over that reduced frame —
    * the single-partition exchange it implies moves only the group
    * rows, never the corpus. `floor` (not `round`) for the ppm: no
    * half-way ties, so every engine agrees bit-for-bit. */
  /** Whitespace token count over normalized text — THE shared proxy
    * both the batch mixes and the streaming accounting use, so batch
    * backfill and stream can never silently diverge on the metric. */
  def wsTokenCount(textCol: Column): Column =
    size(split(Dedup.normalizeText(textCol), " ")).cast("long")

  def sourceMix(df: DataFrame, srcCol: String, langCol: String,
      textCol: String): DataFrame = {
    val toks = wsTokenCount(col(textCol))
    df.select(col(srcCol), col(langCol), toks.as("__t"))
      .groupBy(col(srcCol), col(langCol))
      .agg(count(lit(1)).as("n_docs"), sum(col("__t")).as("sum_tokens"))
      .withColumn("token_ppm",
        floor(col("sum_tokens").cast("double") * 1000000.0 /
          sum(col("sum_tokens")).over(Window.partitionBy())).cast("long"))
  }

  /** Common multi-label public suffixes for [[registrableDomain]].
    * BOUNDARY (documented, no external list in this environment): this
    * is a built-in subset of the Mozilla Public Suffix List covering
    * the frequent ccTLD second-level registries; suffixes outside it
    * fall back to the PSL's own default rule (last label is the
    * suffix), which is also what the PSL prescribes for unknown TLDs.
    * Swap in the full list as a deployment config where exact PSL
    * parity matters. */
  val multiLabelSuffixes: Seq[String] = Seq(
    "co.uk", "org.uk", "ac.uk", "gov.uk", "net.uk", "me.uk",
    "co.jp", "ne.jp", "or.jp", "ac.jp", "go.jp",
    "com.au", "net.au", "org.au", "edu.au", "gov.au",
    "co.nz", "net.nz", "org.nz", "co.in", "net.in", "org.in",
    "com.br", "net.br", "org.br", "com.cn", "net.cn", "org.cn",
    "com.mx", "com.ar", "com.tr", "com.sg", "co.kr", "co.za",
    "com.hk", "com.tw", "co.id", "co.th", "com.my")

  /** Registrable domain (eTLD+1) of a URL column — the key real web
    * corpora group dedup/caps/mixes by. Pure codegen'd expression, no
    * UDF: strip scheme and userinfo, take the host up to the first
    * `/:?#`, lowercase, drop a trailing dot, then keep suffix+1 labels
    * where the suffix is a known multi-label entry
    * ([[multiLabelSuffixes]]) or else the last label. IPv4 literals
    * and bracketed IPv6 literals pass through unchanged (an address
    * has no registrable parent). */
  def registrableDomain(url: Column): Column =
    registrableDomain(url, multiLabelSuffixes)

  /** [[registrableDomain]] with a caller-supplied multi-label suffix
    * list — the deployment hook for the full Public Suffix List. */
  def registrableDomain(url: Column, suffixes: Seq[String]): Column = {
    val (noUser, host, labels) = urlHostParts(url)
    val suffix2 = concat_ws(".", element_at(labels, -2), element_at(labels, -1))
    // isin (InSet past 10 values): ONE hash-set membership probe; an
    // OR-chain would re-inline the host/split subtree per suffix and
    // bloat the codegen'd expression ~40x
    val inSet = suffix2.isin(suffixes: _*)
    hostSpecialCases(noUser, host)
      .when(size(labels) >= 3 && inSet, array_join(slice(labels, -3, 3), "."))
      .when(size(labels) >= 2, array_join(slice(labels, -2, 2), "."))
      .otherwise(host)
  }

  /** [[registrableDomain]] under FULL Public Suffix List semantics —
    * exact rules of any depth, wildcard rules (`*.kawasaki.jp`:
    * every label under the suffix is itself a public suffix), and
    * exception rules (`!city.kawasaki.jp`: carved back out, its
    * public suffix is the rule minus the leftmost label). The
    * prevailing-rule order of the publicsuffix.org algorithm:
    * exceptions first, then the longest match, then the default rule
    * (bare TLD). Still one pure codegen'd expression: a fixed
    * when-chain of InSet probes over the tail labels, one per
    * (kind, depth) present in the rules — the same probe shape as the
    * subset path, so swapping in the full list costs label-count
    * probes, not a join. A host that IS a public suffix (e.g.
    * `co.uk` itself) has no registrable parent and passes through
    * unchanged, like the IP literals. */
  def registrableDomain(url: Column, rules: PslRules): Column = {
    val (noUser, host, labels) = urlHostParts(url)
    val n = size(labels)
    def lastK(k: Int): Column =
      if (k == 1) element_at(labels, -1)
      else concat_ws(".", (k to 1 by -1).map(i => element_at(labels, -i)): _*)
    // registrable = public suffix (k labels) + 1 label; if the host
    // has no extra label it IS the suffix -> pass through
    def reg(k: Int): Column =
      when(n >= k + 1, array_join(slice(labels, -(k + 1), k + 1), "."))
        .otherwise(host)
    val base = hostSpecialCases(noUser, host)
    // exception rules prevail over everything (desc depth for
    // determinism; overlapping exceptions at different depths are not
    // a thing the PSL produces)
    val withExc = rules.exception.toSeq.sortBy(-_._1)
      .foldLeft(base) { case (acc, (k, rs)) =>
        acc.when(n >= k && lastK(k).isin(rs: _*), reg(k - 1))
      }
    // longest-match: at total depth k, either an exact k-label rule
    // matches the last k labels, or a wildcard rule's (k-1)-label
    // suffix matches and the '*' consumes one more existing label
    val maxK = ((rules.exact.keys ++ rules.wildcard.keys.map(_ + 1))
      ++ Seq(1)).max
    val withMatch = (maxK to 2 by -1).foldLeft(withExc) { case (acc, k) =>
      val ex = rules.exact.getOrElse(k, Nil)
      val wc = rules.wildcard.getOrElse(k - 1, Nil)
      val cond =
        if (ex.nonEmpty && wc.nonEmpty)
          lastK(k).isin(ex: _*) || lastK(k - 1).isin(wc: _*)
        else if (ex.nonEmpty) lastK(k).isin(ex: _*)
        else if (wc.nonEmpty) lastK(k - 1).isin(wc: _*)
        else lit(false)
      if (ex.isEmpty && wc.isEmpty) acc
      else acc.when(n >= k && cond, reg(k))
    }
    // the PSL default rule `*`: the bare last label is the suffix
    withMatch.otherwise(reg(1))
  }

  /** Shared host extraction: scheme/userinfo strip (to the LAST '@'
    * before the path, matching WHATWG host resolution — "a@b@x.com"
    * has host x.com), lowercase, trailing dot dropped. */
  private def urlHostParts(url: Column): (Column, Column, Column) = {
    val noScheme = regexp_replace(url, "^[a-zA-Z][a-zA-Z0-9+.-]*://", "")
    val noUser = regexp_replace(noScheme, "^[^/?#]*@", "")
    val rawHost = lower(regexp_extract(noUser, "^[^/:?#]*", 0))
    val host = regexp_replace(rawHost, "\\.$", "")
    (noUser, host, split(host, "\\."))
  }

  /** IPv6-bracket and IPv4-literal passthroughs (an address has no
    * registrable parent) as the head of the domain when-chain. */
  private def hostSpecialCases(noUser: Column, host: Column): Column =
    when(noUser.startsWith("["),
        lower(regexp_extract(noUser, "^\\[([^\\]]*)\\]", 1)))
      .when(host.rlike("^[0-9]+\\.[0-9]+\\.[0-9]+\\.[0-9]+$"), host)

  /** [[sourceMix]] keyed by registrable domain instead of the source
    * tag — the per-domain token accounting a web-corpus mix is
    * actually planned on. Same scale shape: one partial-aggregated
    * groupBy over (domain, lang), grand total via a window over the
    * reduced frame only; the domain extraction is a narrow row-local
    * projection fused into the scan. */
  def domainMix(df: DataFrame, urlCol: String, langCol: String,
      textCol: String): DataFrame =
    sourceMix(df.withColumn("domain", registrableDomain(col(urlCol))),
      "domain", langCol, textCol)

  /** [[domainMix]] keyed under full-PSL semantics ([[PslRules]]) —
    * the deployment form once the real list is vendored in. */
  def domainMix(df: DataFrame, urlCol: String, langCol: String,
      textCol: String, rules: PslRules): DataFrame =
    sourceMix(df.withColumn("domain", registrableDomain(col(urlCol), rules)),
      "domain", langCol, textCol)

  /** Query-param names dropped by [[canonicalUrl]]: click/campaign
    * trackers that vary per impression while pointing at the same
    * resource — the #1 cause of spurious URL-level "uniqueness" in a
    * web crawl. `utm_*` by prefix plus the fixed click-id set. Only
    * UNAMBIGUOUS ids belong here: generic names like `ref` are
    * content-bearing on major sites (GitHub's `?ref=<branch>` selects
    * different page content), and stripping them would merge genuinely
    * distinct resources — callers who know their crawl's referrer
    * convention opt in via `extraParams`. */
  val trackingParams: Seq[String] =
    Seq("gclid", "fbclid", "msclkid", "yclid", "igshid", "mc_eid")

  /** Canonical form of a URL for exact URL-level dedup: lowercase
    * scheme and host, userinfo stripped (to the LAST '@', WHATWG —
    * same rule as [[registrableDomain]]), default port stripped
    * (http:80 / https:443), fragment stripped, tracking params
    * ([[trackingParams]] + `utm_*`) removed, remaining query params
    * byte-sorted, empty path normalized to "/", trailing slash
    * dropped from non-root paths. Everything is a row-local codegen'd
    * projection (regex chain + a short param array) — it fuses into
    * the scan like the domain extraction. The oracles replay each
    * step textually in SQL.
    *
    * Boundary (scaladoc'd, like the PSL subset): no percent-decoding
    * and no IDN/punycode folding — both change equality classes and
    * need tables this sandbox doesn't carry; deployments layer them
    * in front of this form. */
  def canonicalUrl(url: Column, extraParams: Seq[String] = Nil): Column = {
    val dropParams = trackingParams ++ extraParams
    val noFrag = regexp_replace(url, "#.*$", "")
    val scheme = lower(regexp_extract(noFrag, "^([a-zA-Z][a-zA-Z0-9+.-]*)://", 1))
    val rest = regexp_replace(noFrag, "^[a-zA-Z][a-zA-Z0-9+.-]*://", "")
    val noUser = regexp_replace(rest, "^[^/?#]*@", "")
    val hostPort = regexp_extract(noUser, "^[^/?#]*", 0)
    val host = lower(regexp_replace(hostPort, ":[0-9]+$", ""))
    val port = regexp_extract(hostPort, ":([0-9]+)$", 1)
    val keepPort = !(port === "" ||
      (scheme === "http" && port === "80") ||
      (scheme === "https" && port === "443"))
    val pathQuery = regexp_replace(noUser, "^[^/?#]*", "")
    val rawPath = regexp_extract(pathQuery, "^([^?]*)", 1)
    val path = when(rawPath === "" || rawPath === "/", lit("/"))
      .otherwise(regexp_replace(rawPath, "/$", ""))
    val query = regexp_extract(pathQuery, "\\?(.*)$", 1)
    val kept = filter(split(query, "&"), p => {
      val name = regexp_extract(p, "^([^=]*)", 1)
      !(p === "" || name.startsWith("utm_") ||
        name.isin(dropParams: _*))
    })
    val sortedQ = array_join(array_sort(kept), "&")
    concat(scheme, lit("://"), host,
      when(keepPort, concat(lit(":"), port)).otherwise(lit("")),
      path,
      when(sortedQ === "", lit("")).otherwise(concat(lit("?"), sortedQ)))
  }

  /** Exact URL-level dedup on the canonical form: one row per
    * canonical URL with the smallest id as representative — the
    * hash-groupBy shape of [[Dedup.exactDedup]], keyed by
    * [[canonicalUrl]]. */
  def urlDedup(df: DataFrame, idCol: String, urlCol: String,
      extraParams: Seq[String] = Nil): DataFrame =
    df.select(col(idCol),
        canonicalUrl(col(urlCol), extraParams).as("canonical_url"))
      .groupBy(col("canonical_url"))
      .agg(min(col(idCol)).as("keep_id"), count(lit(1)).as("n_docs"))

  /** Deterministic per-source downsampling to hit a target mix: keep a
    * document iff its stable id-hash bucket ([[TextStats.idBucket]])
    * falls below the source's keep-percentage. No RNG — the same
    * document survives at any parallelism and in every rerun, which is
    * what makes incremental corpus rebuilds diffable; and the predicate
    * is a pure row-local filter, so it pushes to the scan and never
    * shuffles. */
  def resampleBySource(df: DataFrame, idCol: String, srcCol: String,
      keepPct: Map[String, Int], defaultPct: Int = 100): DataFrame = {
    require((keepPct.values ++ Seq(defaultPct)).forall(p => p >= 0 && p <= 100),
      s"keep percentages must be in [0, 100]: $keepPct / $defaultPct")
    val pct = keepPct.foldLeft(lit(defaultPct)) { case (acc, (s, p)) =>
      when(col(srcCol) === s, lit(p)).otherwise(acc)
    }
    df.filter(TextStats.idBucket(col(idCol), 100L) < pct)
  }

  /** EXACTLY min(k, |stratum|) documents per stratum, chosen
    * deterministically by portable-hash rank ([[graft.functions.hashes
    * .lehmer3]] of the id, id tiebreak) — "curate exactly N docs per
    * source", reproducible on any engine and at any parallelism.
    *
    * Scale shape: the naive global form is one window over the whole
    * corpus partitioned by stratum — a full shuffle, and a single-task
    * hotspot for any giant stratum. Here the rank key is a uniform
    * hash, so a per-stratum key THRESHOLD pre-selects ~oversample*k
    * candidates: (1) one reduced count aggregate sizes each stratum
    * (the sizes frame STAYS distributed — the stratum key may be
    * high-cardinality, e.g. millions of domains, so no driver collect
    * and no per-stratum literal anywhere); (2) rows whose key falls
    * at-or-under their stratum's threshold survive — a key cutoff is
    * a PREFIX of the rank order, so >= k survivors imply the true
    * top-k survive; (3) the exact window runs over candidates only
    * (strata x ~oversample*k rows). Undershoot (P ~ e^-k per
    * Chernoff) is detected by ONE aggregated boolean and retried with
    * a raised threshold — exactness never depends on the
    * probabilistic bound. */
  def stratifiedSampleExact(df: DataFrame, idCol: String, srcCol: String,
      k: Int, oversample: Int = 4, maxRounds: Int = 4): DataFrame = {
    require(k > 0 && oversample >= 2, s"need k > 0, oversample >= 2: $k, $oversample")
    val M = 2147483647L // lehmer3 keys live in [1, 2^31 - 2]
    val slim = df.select(col(srcCol).as("__s"), col(idCol))
      .withColumn("__key", graft.functions.hashes.lehmer3(col(idCol)))
    // reduced to one row per stratum; materialized once, reused by
    // every retry round instead of re-aggregating the corpus
    val sizes = Frames.cutLocal(
      slim.groupBy(col("__s")).agg(count(lit(1)).as("__n")))
    def candidates(mult: Long) = {
      val want = oversample.toLong * mult * k
      val cut = expr( // integer arithmetic throughout (div, not /)
        s"case when __n <= ${want}L then ${M}L else (${M}L * ${want}L) div __n + 1L end")
      // AQE broadcasts the sizes frame while it fits and falls back to
      // a shuffle join for genuinely huge stratum counts
      slim.join(sizes.select(col("__s"), cut.as("__cut")), "__s")
        .filter(col("__key") <= col("__cut"))
    }
    var mult = 1L
    var cand = candidates(mult)
    var round = 1
    // survivor-count verification, one boolean off one reduced agg:
    // every stratum needs min(k, n) candidates
    def undershoots(c: DataFrame): Boolean = !c
      .groupBy(col("__s")).agg(count(lit(1)).as("__c"))
      .join(sizes, Seq("__s"), "right")
      .filter(coalesce(col("__c"), lit(0L)) < least(lit(k.toLong), col("__n")))
      .isEmpty
    while (round < maxRounds && undershoots(cand)) {
      mult *= oversample
      cand = candidates(mult)
      round += 1
    }
    if (round == maxRounds) cand = slim // deterministic fallback: exact over everything
    val w = Window.partitionBy(col("__s")).orderBy(col("__key").asc, col(idCol).asc)
    cand.withColumn("rk", row_number().over(w))
      .filter(col("rk") <= k)
      .select(col(idCol), col("__s").as(srcCol), col("rk").cast("long").as("rk"))
  }

  /** Shared DLT priority projection: (extraCols..., id, weight,
    * priority_key) — THE key contract both priority samplers rank by
    * (a change here must stay in lockstep with the DuckDB oracle
    * renderings). */
  private def priorityKeyed(df: DataFrame, idCol: String, textCol: String,
      extraCols: Seq[String]): DataFrame = {
    val w = greatest(
      size(split(TextStats.norm(col(textCol)), " ")).cast("long"), lit(1L))
    val h20 = shiftright(graft.functions.hashes.hash62(col(idCol).cast("long")),
      42)
    df.select(extraCols.map(col) ++
        Seq(col(idCol), w.as("weight"), h20.as("__h20")): _*)
      .select(extraCols.map(col) ++
        Seq(col(idCol), col("weight"),
          expr("(weight * 1048576) div (__h20 + 1)").as("priority_key")): _*)
  }

  /** Deterministic weighted sample WITHOUT replacement — priority
    * sampling (Duffield, Lund & Thorup 2004-07): each item draws a
    * priority q = w/u with u uniform in (0,1], and the k highest
    * priorities form the sample (the scheme whose threshold estimator
    * ŵ = max(w, τ), τ = (k+1)-th priority, is unbiased with
    * near-optimal variance for subset-sum queries — here the natural
    * "sample long documents proportionally more" curation draw, with
    * weight = whitespace token count, min 1).
    *
    * Integer-exact and RNG-free: u comes from the portable 62-bit id
    * hash truncated to its top 20 bits (u = (h20+1)/2^20 ∈ (0,1] at
    * ~1e-6 granularity — far below any sampling-quality signal), so
    * priority_key = (w * 2^20) div (h20 + 1), a pure function of
    * (id, weight) that any engine replays bit-for-bit. The 2^20 scale
    * bounds the key by w * 2^20 < 2^62 for any w < 2^42 — no overflow
    * for any document that fits storage. Ties (floor-collided keys)
    * break by id asc, so the top-k is a total order and the sample is
    * unique.
    *
    * Scale shape: one narrow scan computes (id, weight, key); top-k is
    * TakeOrderedAndProject (per-partition heaps, k rows to the
    * driver). No shuffle, no RNG state, rerun- and
    * parallelism-invariant — the same reproducibility contract as
    * [[resampleBySource]]. */
  def prioritySample(df: DataFrame, idCol: String, textCol: String,
      k: Int): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    priorityKeyed(df, idCol, textCol, Seq.empty)
      .orderBy(col("priority_key").desc, col(idCol))
      .limit(k)
  }

  /** Per-stratum weighted sample: [[prioritySample]]'s
    * Duffield–Lund–Thorup priorities ranked WITHIN each stratum
    * (source, language, …) — "k longest-biased docs per source", the
    * stratified form of the weighted draw, same RNG-free portable-hash
    * key, so the sample is a pure function of (id, weight, stratum).
    *
    * Scale shape: one narrow scan computes the key, then a window
    * partitioned by stratum ranks it — per-stratum populations are
    * the window's task granularity, fine for the bounded stratum
    * domains this targets (sources, languages). A giant-stratum
    * deployment lifts [[stratifiedSampleExact]]'s threshold-prefix
    * trick: a per-stratum KEY cutoff is a prefix of this exact rank
    * order too, so the same candidates-then-exact-window staging
    * applies unchanged (the uniform-hash threshold estimate just
    * becomes a quantile estimate of the priority key). */
  def prioritySampleByStratum(df: DataFrame, idCol: String,
      stratumCol: String, textCol: String, k: Int): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    val win = Window.partitionBy(col(stratumCol))
      .orderBy(col("priority_key").desc, col(idCol).asc)
    priorityKeyed(df, idCol, textCol, Seq(stratumCol))
      .withColumn("rk", row_number().over(win))
      .filter(col("rk") <= k)
      .select(col(idCol), col(stratumCol), col("weight"),
        col("priority_key"), col("rk").cast("long").as("rk"))
  }


  /** Corpus snapshot diff — the incremental-rebuild accounting op:
    * given two corpus snapshots keyed by id, classify every id as
    * `added` (only in the new snapshot), `removed` (only in the old),
    * `changed` (both, different content), or `unchanged`. This is
    * what makes the deterministic curation recipes here
    * ([[resampleBySource]]'s rerun-invariance, the id-hash sharding)
    * pay off: a rebuild's diff is exactly the data that changed.
    *
    * Content comparison uses [[TextStats.fingerprint]]'s portable
    * polynomial rolling hash (mod 1e9+7), so the full-outer join
    * shuffles (id, 8-byte fingerprint) — never document payloads —
    * and the oracle replays every hash exactly. The 2^-30-per-pair
    * collision odds trade a byte-identical comparison for a
    * payload-free shuffle; a deployment wanting certainty re-checks
    * the `unchanged` class with a payload compare on the (tiny)
    * changed-candidate complement, same shape. */
  def snapshotDiff(prev: DataFrame, cur: DataFrame, idCol: String,
      textCol: String): DataFrame = {
    // presence is carried by explicit flags, NOT by fingerprint
    // nullity: a NULL-text document has a NULL fingerprint, and
    // inferring membership from the fingerprint would misclassify it
    // as added/removed; the content compare is null-safe for the same
    // reason (NULL text in both snapshots is unchanged)
    val pa = TextStats.fingerprint(prev, idCol, textCol)
      .select(col(idCol), col("fingerprint").as("__fp_prev"),
        lit(true).as("__in_prev"))
    val pb = TextStats.fingerprint(cur, idCol, textCol)
      .select(col(idCol), col("fingerprint").as("__fp_cur"),
        lit(true).as("__in_cur"))
    pa.join(pb, Seq(idCol), "full_outer")
      .select(col(idCol),
        when(col("__in_prev").isNull, "added")
          .when(col("__in_cur").isNull, "removed")
          .when(!(col("__fp_prev") <=> col("__fp_cur")), "changed")
          .otherwise("unchanged").as("status"))
  }

  /** Deterministic global training-order shuffle + shard assignment:
    * every document gets its exact position in the permutation induced
    * by the portable 62-bit id hash (hash asc, id tiebreak) and a
    * round-robin shard (`pos % nShards` — shard sizes balanced to
    * within 1 doc), with NO global sort anywhere.
    *
    * Scale shape: the permutation key's TOP BITS define `buckets`
    * contiguous key ranges, so global rank = (docs in earlier buckets)
    * + (rank within bucket). One reduced count aggregate sizes the
    * buckets; the exclusive prefix sum runs as a window over that
    * bucket frame (`buckets` rows, never the corpus — the
    * single-partition exchange it implies is over ~KBs); ranks within
    * a bucket come from a window partitioned by bucket, whose
    * per-partition population is corpus/buckets and is dialed by
    * `log2Buckets` (up to 2^20+ at 100 TB). The naive form — one
    * `row_number() OVER (ORDER BY hash)` — plans as a single-task
    * total sort and cannot scale past one executor. */
  def globalShuffle(df: DataFrame, idCol: String, nShards: Int,
      log2Buckets: Int = 12): DataFrame = {
    require(nShards > 0 && log2Buckets >= 1 && log2Buckets <= 40,
      s"bad nShards/log2Buckets: $nShards/$log2Buckets")
    val keyed = df.select(col(idCol))
      .withColumn("__key", graft.functions.hashes.hash62(col(idCol)))
      .withColumn("__b", shiftright(col("__key"), 62 - log2Buckets))
    // bucket frame: one row per occupied key-range; the window below
    // runs over THIS frame only
    val wOff = Window.orderBy(col("__b").asc)
      .rowsBetween(Window.unboundedPreceding, -1)
    val offsets = keyed.groupBy(col("__b")).agg(count(lit(1)).as("__n"))
      .withColumn("__off", coalesce(sum(col("__n")).over(wOff), lit(0L)))
      .select(col("__b"), col("__off"))
    val wIn = Window.partitionBy(col("__b"))
      .orderBy(col("__key").asc, col(idCol).asc)
    keyed.join(offsets, "__b") // AQE broadcasts the bucket frame
      .withColumn("shuffle_pos", col("__off") + row_number().over(wIn) - 1)
      .select(col(idCol), col("shuffle_pos"),
        pmod(col("shuffle_pos"), lit(nShards.toLong)).as("shard"))
  }

  /** Temperature-based source rebalancing — the multilingual-LM mixing
    * recipe (sample sources ∝ p_s^alpha with alpha < 1 to flatten the
    * head and upweight the tail). With downsampling only, the
    * achievable scaling keeps source s at f_s = (t_min / t_s)^(1-alpha)
    * of its tokens: the smallest source keeps everything, larger
    * sources shrink toward the tempered share. Per-doc keep decisions
    * are the stable id-hash bucket of [[resampleBySource]] — no RNG,
    * reproducible at any parallelism, and diffable across rebuilds.
    *
    * Scale shape: one reduced per-source aggregate, a one-row min
    * broadcast, keep thresholds computed on the reduced frame, one
    * broadcast join back — the corpus itself never shuffles.
    *
    * Exactness: at the default alpha = 0.5, f_s = sqrt(t_min / t_s) —
    * division and sqrt are correctly-rounded IEEE ops, so every engine
    * reproduces the ppm thresholds bit-for-bit. (A general pow() is
    * NOT correctly rounded; callers using other alphas trade the
    * exact-oracle property for flexibility.) */
  def temperatureResample(df: DataFrame, idCol: String, srcCol: String,
      textCol: String, alpha: Double = 0.5): DataFrame = {
    require(alpha > 0 && alpha <= 1, s"alpha in (0, 1]: $alpha")
    val toks = size(split(Dedup.normalizeText(col(textCol)), " ")).cast("long")
    val sizes = df.select(col(srcCol), toks.as("__t"))
      .groupBy(col(srcCol)).agg(sum(col("__t")).as("__ts"))
    val tmin = sizes.agg(min(col("__ts")).as("__tmin"))
    val ratio = col("__tmin").cast("double") / col("__ts").cast("double")
    val frac = if (alpha == 0.5) sqrt(ratio) else pow(ratio, 1.0 - alpha)
    val plan = sizes.crossJoin(broadcast(tmin))
      .select(col(srcCol), col("__ts").as("sum_tokens"),
        floor(frac * 1000000.0).cast("long").as("keep_ppm"))
    df.select(col(idCol), col(srcCol))
      .join(broadcast(plan), srcCol)
      .filter(TextStats.idBucket(col(idCol), 1000000L) < col("keep_ppm"))
      .select(col(idCol), col(srcCol), col("sum_tokens"), col("keep_ppm"))
  }

  /** Byte-budget training shards (the webdataset / tar-shard packing
    * shape: consecutive ~B-byte shards in id order):
    * shard(doc) = exclusive-prefix-byte-sum div B.
    *
    * Scale shape: the prefix sum uses the same bucket-offset
    * composition as [[globalShuffle]], but keyed by ID RANGES (the
    * fill order is id order and ids are not uniform, so hash buckets
    * would interleave): exact-percentile id cuts from one aggregate
    * bucket the corpus contiguously; per-bucket byte totals + a window
    * over THAT reduced frame (<= nBuckets rows) give exclusive bucket
    * offsets; a within-bucket running sum composes the global prefix —
    * no corpus-wide single-partition window at any size. */
  def byteShards(df: DataFrame, idCol: String, textCol: String,
      bytesPerShard: Long, nBuckets: Int = 65536): DataFrame = {
    require(bytesPerShard > 0 && nBuckets >= 2)
    val sized = df.select(col(idCol),
      octet_length(col(textCol)).cast("long").as("__b"))
    // contiguous-in-id buckets via ONE width_bucket expression over the
    // id span (a percentile-cut when-chain was 255 nested branches —
    // it fell out of codegen and cost 7x this form). Uniform ranges
    // can be population-skewed by weird id spaces; that only affects
    // parallelism of the within-bucket window, and a high default
    // bucket count bounds it (empty ranges never materialize).
    val mm = sized.agg(min(col(idCol)), max(col(idCol))).head()
    val (lo, hi) = (mm.getLong(0), mm.getLong(1))
    val keyed = sized.withColumn("__bk",
      expr(s"width_bucket($idCol, ${lo}L, ${hi}L + 1, $nBuckets)"))
    val wOff = Window.orderBy(col("__bk").asc)
      .rowsBetween(Window.unboundedPreceding, -1)
    val offsets = keyed.groupBy(col("__bk")).agg(sum(col("__b")).as("__bs"))
      .withColumn("__off", coalesce(sum(col("__bs")).over(wOff), lit(0L)))
      .select(col("__bk"), col("__off"))
    val wIn = Window.partitionBy(col("__bk")).orderBy(col(idCol).asc)
      .rowsBetween(Window.unboundedPreceding, -1)
    keyed.join(offsets, "__bk") // AQE broadcasts the bucket frame
      .withColumn("__pre", col("__off") + coalesce(sum(col("__b")).over(wIn), lit(0L)))
      .select(col(idCol), col("__b").as("n_bytes"),
        expr(s"__pre div ${bytesPerShard}L").as("shard"))
  }

  /** Pairwise n-gram overlap between sources: for every source pair,
    * the exact Jaccard (in ppm, floor) of their distinct word-n-gram
    * sets — "how much does subcorpus A repeat subcorpus B", the
    * corpus-diversity / cross-source-contamination matrix.
    *
    * Scale shape: the corpus reduces to distinct (source, 64-bit gram
    * hash) rows in one partially-aggregated pass; per-gram source sets
    * are bounded by the SOURCE count (not corpus size), and pair
    * counts aggregate over the exploded combinations — every shuffle
    * row is a hash or a (source, source, count) triple, and nothing is
    * ever joined against the corpus. Gram identity by hash: pair
    * counts conflate grams at ~|grams|^2 / 2^64 — vanishing. */
  def sourceOverlap(df: DataFrame, srcCol: String, textCol: String,
      n: Int = 3): DataFrame = {
    // materialized ONCE (r21, guide §2.4): sizes and the pair counts
    // both consume the distinct (source, shingle) set, and without a
    // cut each consumer re-ran the whole scan+shingle+distinct subtree
    // (two identical map stages in the r20 plan)
    val bySrc = Frames.cutLocal(
      Dedup.explodedShingleHashes(df, srcCol, textCol, n, word = true)
        .select(col(srcCol).as("__s"), col("ng")).distinct())
    val sizes = bySrc.groupBy(col("__s")).agg(count(lit(1)).as("__n"))
    val shared = bySrc.groupBy(col("ng"))
      .agg(sort_array(collect_set(col("__s"))).as("__ss"))
      // combinations only (tail-slice after each position), never the
      // |ss|^2 cross that an explode x explode + a<b filter would copy
      .select(posexplode(col("__ss")).as(Seq("__i", "source_a")), col("__ss"))
      .select(col("source_a"),
        explode(expr("slice(__ss, __i + 2, size(__ss))")).as("source_b"))
      .groupBy(col("source_a"), col("source_b"))
      .agg(count(lit(1)).as("n_shared"))
    // the result is source-pair-sized: materialize it, then free the
    // shingle cut (the radiusOutlierRemoval storage discipline)
    val result = Frames.materializeCut(shared
      .join(sizes.select(col("__s").as("source_a"), col("__n").as("n_a")), "source_a")
      .join(sizes.select(col("__s").as("source_b"), col("__n").as("n_b")), "source_b")
      .select(col("source_a"), col("source_b"), col("n_a"), col("n_b"), col("n_shared"),
        expr("n_shared * 1000000 div (n_a + n_b - n_shared)").as("jaccard_ppm")))
    Frames.free(bySrc)
    result
  }

  /** The crawl-curation funnel as ONE composed job — the stages a
    * web-scale training-data pipeline chains between raw fetch records
    * and training shards, in their production order:
    *
    *   1. `response_200`  — keep successful fetches only
    *   2. `url_unique`    — canonical-URL dedup ([[canonicalUrl]]),
    *                        min-id representative per canonical form
    *   3. `quality_kept`  — Gopher rule gate
    *                        ([[TextStats.gopherRules]])
    *   4. `exact_unique`  — exact dedup on normalized text, min-id rep
    *   5. `near_unique`   — MinHash-LSH near-dup removal: drop every
    *                        doc with a verified `>= jaccard` neighbor
    *                        of SMALLER id (the deterministic pairwise
    *                        contract; [[Dedup.minhashNearDups]])
    *
    * Returns the ordered stage list (name -> surviving rows carrying
    * `__t`, the normalized text, and the original columns) so callers
    * can take the final stage or account the whole funnel.
    *
    * Materialize-and-free contract: calling this EAGERLY materializes
    * all six stage frames with lineage cut (each stage is read by at
    * least two consumer branches downstream — see the inline note —
    * so an unmaterialized funnel re-executes its prefix per branch).
    * Every caller owns the release: call [[freeStages]] on the
    * returned list once all consumers of the stage frames are
    * materialized, or the cut blocks stay pinned in executor storage
    * for the lifetime of the session.
    *
    * Scale shape: every stage keys its shuffle on an 8-byte hash
    * (xxhash64 of the canonical URL / normalized text), never the
    * text itself; the near-dup stage is the banded-LSH pipeline
    * (never all-pairs); survivors flow stage-to-stage as left-semi /
    * left-anti joins on the id — no stage re-reads the raw corpus. */
  def curateStages(df: DataFrame, idCol: String, urlCol: String,
      statusCol: String, textCol: String, minWords: Int = 40,
      jaccard: Double = 0.8,
      htmlExtract: Boolean = false): Seq[(String, DataFrame)] = {
    // crawl bodies are markup, not text: when asked, the exactly-
    // specified HtmlText chain runs BEFORE normalization, so tag soup
    // never reaches the word-count/stopword gates
    val raw = if (htmlExtract) HtmlText.htmlToText(col(textCol))
      else col(textCol)
    // every stage frame is materialized with lineage cut: each
    // groupBy+semi-join stage reads its input through BOTH branches
    // (the key reduction and the probe side), and Spark does not share
    // common subplans across join branches — unmaterialized, stage k
    // re-executes the whole prefix per branch, which the r17 profile
    // measured as 14 s of a 6-stage funnel aggregation that costs 4 s
    // staged. Callers release the cuts via [[freeStages]] once their
    // result frame is materialized.
    val parsed = Frames.materializeCut(df.select(col(idCol), col(urlCol),
      col(statusCol), TextStats.norm(raw).as("__t")))
    val resp = parsed.filter(col(statusCol) === 200)
    // canonical-URL dedup — group on the 64-bit hash of the canonical
    // form (the canonical string itself never shuffles; it is not an
    // output column here, so any uniform hash works for grouping)
    val canon = resp.withColumn("__ch",
      xxhash64(canonicalUrl(col(urlCol))))
    val urlKeep = canon.groupBy(col("__ch")).agg(min(col(idCol)).as(idCol))
    val afterUrl = Frames.materializeCut(canon
      .join(urlKeep.select(idCol), Seq(idCol), "left_semi").drop("__ch"))
    val gateKeep = TextStats.gopherRules(afterUrl, idCol, "__t",
        minWords = minWords)
      .filter(col("keep")).select(idCol)
    val afterGate = Frames.materializeCut(
      afterUrl.join(gateKeep, Seq(idCol), "left_semi"))
    val exactKeep = afterGate.groupBy(xxhash64(col("__t")).as("__th"))
      .agg(min(col(idCol)).as(idCol))
    val afterExact = Frames.materializeCut(
      afterGate.join(exactKeep.select(idCol), Seq(idCol), "left_semi"))
    val nearDrop = Dedup.minhashNearDups(afterExact, idCol, "__t",
        threshold = jaccard)
      .select(col("id_b").as(idCol)).distinct()
    val afterNear = Frames.materializeCut(
      afterExact.join(nearDrop, Seq(idCol), "left_anti"))
    Seq("parsed" -> parsed, "response_200" -> resp,
      "url_unique" -> afterUrl, "quality_kept" -> afterGate,
      "exact_unique" -> afterExact, "near_unique" -> afterNear)
  }

  /** Release the executor storage behind [[curateStages]]' cuts once
    * every consumer of the stage frames is materialized. */
  def freeStages(stages: Seq[(String, DataFrame)]): Unit =
    stages.foreach { case (_, sdf) => Frames.free(sdf) }

  /** The [[curateStages]] funnel's per-stage survivor COUNTS in one
    * pass — the accounting view a crawl operator watches, without the
    * six-branch plan that aggregating each stage frame separately
    * builds.
    *
    * Instead of materializing stage frames and semi-joining survivors
    * forward, every stage decision becomes a SURVIVAL FLAG on the one
    * parsed frame:
    *
    *   - `response_200`: a row-local status comparison;
    *   - `url_unique` / `exact_unique`: group-wise min-id membership
    *     via a window over the stage's hash key, CONDITIONED on the
    *     previous flag (`min(when(prev, id)) over (partition by key)`)
    *     — the groupBy+left-semi pair collapses to one exchange each;
    *   - `quality_kept`: the row-local [[TextStats.gopherKeep]];
    *   - `near_unique`: the one genuine join left — the banded-LSH
    *     near-dup pass over the exact-unique survivors — folded back
    *     as a left-join null test.
    *
    * One conditional aggregation then reads all six counts off the
    * flagged frame and `stack`s them into the (stage, n_docs) report.
    * Two hash-key exchanges + the LSH pass replace four semi-joins,
    * two groupBys, and six aggregation branches; at 100 TB the window
    * groups are single URLs/texts (tiny), so the windows parallelize
    * like the groupBys they replace. Bit-identical to aggregating
    * [[curateStages]] (shared spec + shared oracle). */
  def curateFunnelCounts(df: DataFrame, idCol: String, urlCol: String,
      statusCol: String, textCol: String, minWords: Int = 40,
      jaccard: Double = 0.8, htmlExtract: Boolean = false): DataFrame = {
    val raw = if (htmlExtract) HtmlText.htmlToText(col(textCol))
      else col(textCol)
    val wUrl = Window.partitionBy(col("__ch"))
    val wTxt = Window.partitionBy(col("__th"))
    val flagged = df.select(col(idCol).as("__id"),
        (col(statusCol) === 200).as("__resp"),
        xxhash64(canonicalUrl(col(urlCol))).as("__ch"),
        TextStats.norm(raw).as("__t"))
      .withColumn("__url_keep", col("__resp") &&
        col("__id") === min(when(col("__resp"), col("__id"))).over(wUrl))
      .withColumn("__gate", col("__url_keep") &&
        TextStats.gopherKeep(col("__t"), minWords = minWords))
      .withColumn("__th", xxhash64(col("__t")))
      .withColumn("__exact", col("__gate") &&
        col("__id") === min(when(col("__gate"), col("__id"))).over(wTxt))
    val mat = Frames.materializeCut(flagged.select(
      col("__id"), col("__resp"), col("__url_keep"), col("__gate"),
      col("__exact"), col("__t")))
    val nearDrop = Dedup.minhashNearDups(mat.filter(col("__exact")),
        "__id", "__t", threshold = jaccard)
      .select(col("id_b").as("__id")).distinct()
      .withColumn("__dropped", lit(true))
    val out = mat.join(nearDrop, Seq("__id"), "left")
      .agg(count(lit(1)).as("parsed"),
        // coalesce: an EMPTY crawl's ungrouped sums are NULL but the
        // report's contract is six zero counts
        coalesce(sum(col("__resp").cast("long")), lit(0L)).as("response_200"),
        coalesce(sum(col("__url_keep").cast("long")), lit(0L)).as("url_unique"),
        coalesce(sum(col("__gate").cast("long")), lit(0L)).as("quality_kept"),
        coalesce(sum(col("__exact").cast("long")), lit(0L)).as("exact_unique"),
        coalesce(sum((col("__exact") && col("__dropped").isNull).cast("long")),
          lit(0L)).as("near_unique"))
      .selectExpr("""stack(6,
        'parsed', parsed, 'response_200', response_200,
        'url_unique', url_unique, 'quality_kept', quality_kept,
        'exact_unique', exact_unique, 'near_unique', near_unique)
        AS (stage, n_docs)""")
    val result = Frames.materializeCut(out)
    Frames.free(mat)
    result
  }

  /** [[curateStages]] carried through to training-ready accounting:
    * train a BPE tokenizer ON the curated survivors
    * ([[TextStats.bpeTrainMerges]] — train-on-curated, the production
    * order), encode each survivor to its REAL token count, then cap
    * every registrable domain's token budget in id (crawl) order —
    * greedy cumulative-sum, first-crawled-first-kept. Returns
    * (id, domain, n_tokens) of the docs inside their domain budgets.
    *
    * The per-domain window sorts each domain's survivors by id — at
    * 100 TB domains are many and individually small (the whole point
    * of the cap), so the window parallelizes across domains; no
    * global sort exists anywhere in the chain. */
  def curatePipeline(df: DataFrame, idCol: String, urlCol: String,
      statusCol: String, textCol: String, minWords: Int = 40,
      jaccard: Double = 0.8, bpeRounds: Int = 8,
      capTokens: Long = 2000L, htmlExtract: Boolean = false,
      trainedBpe: Option[graft.functions.BpeTable] = None): DataFrame = {
    // the survivor set is consumed three ways (BPE training, token
    // encode, the domain-cap join): the curation chain arrives
    // already stage-cut from curateStages, and every cut is released
    // after the result frame exists — the knBigramScore
    // free-after-materialize discipline
    val stages = curateStages(df, idCol, urlCol, statusCol, textCol,
      minWords, jaccard, htmlExtract)
    val survivors = stages.last._2
    val table = trainedBpe.getOrElse(TextStats.bpeTable(
      TextStats.bpeTrainMerges(survivors, "__t", bpeRounds)))
    val counts = TextStats.bpeEncodeApply(survivors, idCol, "__t", table)
      .select(col(idCol), col("n_tokens"))
    val w = Window.partitionBy(col("domain")).orderBy(col(idCol).asc)
    val out = survivors
      .select(col(idCol), registrableDomain(col(urlCol)).as("domain"))
      .join(counts, Seq(idCol))
      .withColumn("__cum", sum(col("n_tokens")).over(w))
      .filter(col("__cum") <= capTokens)
      .select(col(idCol), col("domain"), col("n_tokens"))
    val result = Frames.materializeCut(out)
    freeStages(stages)
    result
  }

  /** [[curateStages]] aggregated to the per-stage survivor-count
    * report — the six-branch implementation whose agreement with the
    * window-flag [[curateFunnelCounts]] is itself a correctness
    * cross-check (shared oracle); result materialized, stage cuts
    * released. */
  def curateFunnelReport(df: DataFrame, idCol: String, urlCol: String,
      statusCol: String, textCol: String, minWords: Int = 40,
      jaccard: Double = 0.8, htmlExtract: Boolean = false): DataFrame = {
    val stages = curateStages(df, idCol, urlCol, statusCol, textCol,
      minWords, jaccard, htmlExtract)
    val out = stages.map { case (name, sdf) =>
      sdf.agg(lit(name).as("stage"), count(lit(1)).as("n_docs"))
    }.reduce(_ unionByName _)
    val result = Frames.materializeCut(out)
    freeStages(stages)
    result
  }

  /** Dataset-card profile: the one-table-per-source summary a corpus
    * release ships (and a mixing decision starts from) — doc count,
    * language spread, token volume, and the exact-duplicate exposure
    * (docs whose normalized text occurs more than once ANYWHERE in
    * the corpus, attributed to their own source), dup rate in integer
    * ppm (floor). One pass: an 8-byte-hash count window (text never
    * shuffles) then one reduce to the tiny per-source frame. */
  def corpusProfile(df: DataFrame, textCol: String, langCol: String,
      srcCol: String): DataFrame = {
    val base = df.select(col(srcCol).as("source"), col(langCol).as("lang"),
      size(split(Dedup.normalizeText(col(textCol)), " ")).cast("long")
        .as("__w"),
      xxhash64(Dedup.normalizeText(col(textCol))).as("__h"))
    base.withColumn("__n",
        count(lit(1)).over(Window.partitionBy(col("__h"))))
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"),
        countDistinct(col("lang")).as("n_langs"),
        sum(col("__w")).as("total_words"),
        expr("sum(__w) div count(1)").as("mean_words"),
        sum(when(col("__n") > 1, 1L).otherwise(0L)).as("n_dup_docs"),
        expr("sum(CASE WHEN __n > 1 THEN 1 ELSE 0 END) * 1000000 div count(1)")
          .as("dup_ppm"))
  }

  /** WET conversion-record generation — the text-extraction artifact a
    * crawl archive publishes NEXT TO the raw responses (one
    * `conversion` record per fetched page, plain-text payload,
    * refers-to link): html -> text through the codegen'd
    * [[HtmlText.htmlToText]] regex chain, then each row encodes a
    * REAL WARC conversion record
    * ([[graft.sources.Warc.encodeConversion]], closed-form byte
    * length) and immediately re-parses it through the strict reader —
    * the emitted fields come from the RE-PARSED record, so they only
    * match the oracle if every byte of the WET encoding survived the
    * round trip (the mm_image_transcode discipline). Extraction +
    * encode + parse is one narrow map; id must be a Long column.
    * Emits (id, target_uri, warc_type, content_length, wet_len,
    * body). */
  def wetRecords(pages: DataFrame, idCol: String, uriCol: String,
      htmlCol: String, date: String): DataFrame = {
    val enc = org.apache.spark.sql.Encoders.product[
      (Long, String, String, Long, Long, String)]
    pages.select(col(idCol), col(uriCol).as("__uri"),
        HtmlText.htmlToText(col(htmlCol)).as("__txt"))
      .mapPartitions { it: Iterator[org.apache.spark.sql.Row] =>
        it.map { r =>
          val id = r.getLong(0); val uri = r.getString(1)
          val bytes = graft.sources.Warc.encodeConversion(uri, date,
            r.getString(2).getBytes(java.nio.charset.StandardCharsets.UTF_8))
          val parsed = graft.sources.Warc.parseAll(bytes)
          require(parsed.length == 1 && parsed.head.warcType == "conversion",
            s"WET record for $uri did not round-trip to one conversion record")
          val w = parsed.head
          (id, w.targetUri, w.warcType, w.contentLength,
            bytes.length.toLong,
            new String(w.body, java.nio.charset.StandardCharsets.UTF_8))
        }
      }(enc).toDF(idCol, "target_uri", "warc_type", "content_length",
        "wet_len", "body")
  }
}
