package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** URL-level crawl curation: canonicalization, registrable-domain
  * extraction, and per-domain document caps — the step every web-scale
  * pretraining pipeline runs BEFORE any text-level dedup, because the
  * cheapest duplicate to kill is the one whose identity is already in the
  * URL (RefinedWeb §3.1 runs URL dedup + per-domain filtering ahead of
  * MinHash; CCNet and C4 both key their shard layout on the canonical
  * URL). Reference correspondence: the reference pipeline keys every
  * record on the ingest URI (pipeline/src/main/kotlin/pipeline/impl/
  * KafkaIntelligencePipeline.kt:304-341 — `DataRecord.name` IS the source
  * path/URI); this module supplies the normalization that makes that key
  * collision-correct for crawl URIs.
  *
  * Everything here is a PURE COLUMN composition (regexp + higher-order
  * array functions, all codegen'd builtins — no UDF): at 100 TB this runs
  * map-only inside the scan's whole-stage-codegen span, and the DuckDB
  * oracle replays the identical algebra (`regexp_extract`/`list_filter`/
  * `list_sort` are common to both engines), so the convention is
  * hash-pinned rather than documented-and-hoped.
  *
  * Canonicalization convention (the industry-standard safe subset — each
  * step only merges surface forms that serve the same resource):
  *   1. drop the fragment (`#...` — client-side only, RFC 3986 §3.5)
  *   2. lowercase scheme and host (RFC 3986 §6.2.2.1 case normalization)
  *   3. strip the scheme's default port (`:80` http, `:443` https)
  *   4. strip one leading `www.` label
  *   5. empty path → `/`; otherwise strip one trailing `/`
  *   6. drop `utm_*` tracking parameters, sort the remainder byte-wise
  *      (param order is semantically irrelevant for the overwhelming
  *      majority of endpoints; tracking params never change content)
  *
  * Registrable domain is the last two host labels (`a.b.c.d` → `c.d`),
  * host itself when dot-free — a DOCUMENTED simplification of the Public
  * Suffix List (the PSL is a 15k-entry mutable snapshot; shipping it would
  * pin the oracle to a moving file). For per-domain capping the
  * two-label rule errs only on multi-label suffixes (`*.co.uk`), where it
  * groups MORE aggressively — caps stay caps.
  */
object UrlOps {

  /** Scheme of a raw URL, lowercased; "" when the input has no
    * `scheme://` prefix. */
  def urlScheme(url: Column): Column =
    lower(regexp_extract(url, "^([A-Za-z][A-Za-z0-9+.-]*)://", 1))

  /** Canonical host: lowercased, default port stripped (scheme-aware),
    * leading `www.` labels removed — ALL of them, not one: the canonical
    * form must be a FIXED POINT of canonicalization (idempotence,
    * property-pinned in UrlOpsSpec), or an index keyed on canonical
    * forms would merge a re-fed key differently than the original.
    * "" for scheme-less input. */
  def urlHost(url: Column): Column = {
    val raw = lower(regexp_extract(url, "^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]*)", 1))
    val scheme = urlScheme(url)
    val noPort = when(scheme === "http", regexp_replace(raw, ":80$", ""))
      .when(scheme === "https", regexp_replace(raw, ":443$", ""))
      .otherwise(raw)
    regexp_replace(noPort, "^(www\\.)+", "")
  }

  /** Canonical path: fragment-and-query-free, ALL trailing slashes
    * stripped (one would break idempotence on `/a//`), "" → "/". */
  def urlPath(url: Column): Column = {
    val p = regexp_extract(url, "^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*([^?#]*)", 1)
    val stripped = regexp_replace(p, "/+$", "")
    when(stripped === "", lit("/")).otherwise(stripped)
  }

  /** Canonical query string: fragment dropped, empty and `utm_*` params
    * removed, remainder sorted byte-wise and re-joined. "" when nothing
    * survives. */
  def urlQuery(url: Column): Column = {
    val q = regexp_extract(url, "\\?([^#]*)", 1)
    val params = filter(split(q, "&"),
      p => length(p) > 0 && !p.startsWith("utm_"))
    array_join(array_sort(params), "&")
  }

  /** The full canonical form: `scheme://host path [?query]`. Inputs
    * without a `scheme://` prefix canonicalize to the original string
    * lowercased — a relative or garbage "URL" still gets a deterministic
    * identity rather than a null that would vanish from a dedup key. */
  def canonicalizeUrl(url: Column): Column = {
    val scheme = urlScheme(url)
    val q = urlQuery(url)
    when(scheme === "", lower(url)).otherwise(concat(
      scheme, lit("://"), urlHost(url), urlPath(url),
      when(q === "", lit("")).otherwise(concat(lit("?"), q))))
  }

  /** Registrable domain of a canonical host: last two dot-labels, or the
    * host itself when dot-free (see object doc for the PSL deviation). */
  def registrableDomain(host: Column): Column = {
    val twoLabel = regexp_extract(host, "([^.]+\\.[^.]+)$", 1)
    when(twoLabel === "", host).otherwise(twoLabel)
  }

  /** Registrable-domain annotation with an OPTIONAL public-suffix table —
    * the documented two-label simplification, parameterized: `*.co.uk`-
    * class suffixes over-merge per-domain caps under the default rule
    * (every co.uk site shares one cap bucket), so callers with a Public
    * Suffix List snapshot pass it as a bounded one-string-column
    * DataFrame and get PSL-correct grouping; callers without one get the
    * default unchanged.
    *
    * Semantics (the PSL longest-match rule over the supported subset):
    * a host whose last 3 labels equal a 3-label suffix → registrable =
    * last 4 labels; else last 2 labels equal a 2-label suffix →
    * registrable = last 3 labels; else the default two-label rule.
    * A host that IS a bare suffix stays itself. 1-label suffixes (com,
    * org …) are accepted and ignored — the default rule already yields
    * label+suffix for them. Wildcard/exception PSL rules (`*.ck`,
    * `!www.ck`) and suffixes over 3 labels are rejected fail-fast
    * rather than silently mis-grouped.
    *
    * Scale: the suffix table is bounded (the full PSL is ~15k rows) and
    * BROADCASTS onto both left joins; the host side never shuffles and
    * the candidate extraction is codegen'd regexp — the same map-only
    * posture as the default rule, plus two broadcast probes. */
  def withRegistrableDomain(df: DataFrame, hostCol: String, outCol: String,
      suffixes: Option[DataFrame] = None): DataFrame = {
    val host = col(hostCol)
    suffixes match {
      case None => df.withColumn(outCol, registrableDomain(host))
      case Some(suf) =>
        // normalize + dedup the table defensively: a duplicate suffix row
        // (trivial when concatenating the PSL's ICANN + private sections)
        // would otherwise FAN OUT every matching host through the left
        // join and silently double-count it in every downstream census;
        // an upper-cased rule would silently never match a canonical host
        val s = suf
          .select(lower(trim(col(suf.columns.head).cast("string"))).as("__suffix"))
          .distinct()
          .withColumn("__labels", size(split(col("__suffix"), "\\.")))
        val bad = s.filter(col("__labels") > 3 ||
            col("__suffix").contains("*") || col("__suffix").contains("!"))
          .limit(5).collect() // bounded table by contract — cheap action
        require(bad.isEmpty, "unsupported suffix rules (wildcard/exception/" +
          s">3 labels): ${bad.map(_.getString(0)).mkString(", ")}")
        val c2 = regexp_extract(host, "([^.]+\\.[^.]+)$", 1)
        val c3 = regexp_extract(host, "([^.]+\\.[^.]+\\.[^.]+)$", 1)
        val r4 = regexp_extract(host, "([^.]+\\.[^.]+\\.[^.]+\\.[^.]+)$", 1)
        df.withColumn("__c2", c2).withColumn("__c3", c3)
          .join(broadcast(s.filter(col("__labels") === 3)
            .select(col("__suffix").as("__s3"))), col("__c3") === col("__s3"), "left")
          .join(broadcast(s.filter(col("__labels") === 2)
            .select(col("__suffix").as("__s2"))), col("__c2") === col("__s2"), "left")
          .withColumn(outCol,
            when(col("__s3").isNotNull, // longest match first (PSL rule)
              when(r4 === "", host).otherwise(r4))
            .when(col("__s2").isNotNull,
              when(col("__c3") === "", host).otherwise(col("__c3")))
            .otherwise(registrableDomain(host)))
          .drop("__c2", "__c3", "__s3", "__s2")
    }
  }

  /** Keep at most `cap` rows per domain, best-first by `orderCols` (ties
    * MUST be broken by a unique key in `orderCols` for determinism).
    * Planned as `row_number ≤ cap` over a DOMAIN-partitioned window —
    * Spark's WindowGroupLimit pushes the limit into the sort, so each
    * domain's task keeps a cap-sized heap rather than sorting the domain:
    * the per-domain cost at 100 TB is O(n log cap), and no unpartitioned
    * window ever appears (PlanAuditSpec's registry-wide pin). */
  def capPerDomain(df: DataFrame, domainCol: String, orderCols: Seq[Column],
      cap: Int): DataFrame = {
    require(cap > 0, "cap must be positive")
    val w = Window.partitionBy(col(domainCol)).orderBy(orderCols: _*)
    df.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") <= cap)
      .drop("__rn")
  }
}
