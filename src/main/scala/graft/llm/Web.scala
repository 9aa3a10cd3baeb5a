package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Web-corpus URL operators: canonicalization, registrable-domain
  * extraction, and URL-level dedup — the first dedup stage of a
  * CommonCrawl-style pipeline (dup URLs are collapsed before any text
  * is fetched or compared; cf. the CCNet/RefinedWeb recipes).
  *
  * Everything is built from codegen'd builtins (`parse_url`, regexes,
  * higher-order array functions) — no UDFs — so canonicalization runs
  * inside WholeStageCodegen on the scan side and the only shuffle in
  * [[urlDedup]] is the final canonical-key group. */
object Web {

  /** Synthetic URL for a document row, a closed form of (doc_id,
    * source) so the DuckDB oracle can regenerate the expected canonical
    * independently: mixed-case scheme/host, explicit default port,
    * tracking params (utm_*, ref) interleaved with a real param, and a
    * fragment — everything canonicalization must strip. Collisions are
    * planted by keying the path/id on doc_id % 7: distinct raw URLs
    * (utm_content differs per doc) that collapse only AFTER
    * canonicalization, the shape URL dedup exists for. */
  def syntheticUrl(docId: Column, source: Column): Column =
    concat(
      lit("HTTPS://WWW."), upper(source), lit(".Example.COM:443/articles/"),
      (docId % 7).cast("string"),
      lit("?utm_content="), docId.cast("string"),
      lit("&id="), (docId % 7).cast("string"),
      when(docId % 3 === 0, lit("&ref=feed")).otherwise(lit("")),
      lit("#sec"), (docId % 5).cast("string"))

  /** Lowercased host with any `www.` prefix stripped — the hostname
    * dedup actually groups by. `parse_url(…, HOST)` already excludes
    * userinfo and port. */
  def canonicalHost(url: Column): Column =
    regexp_replace(lower(parse_url(url, lit("HOST"))), "^www\\.", "")

  /** Registrable domain approximation: the last two dot-labels of the
    * canonical host (example.com from a.b.example.com). A real public-
    * suffix-list lookup is a broadcast join against the PSL table —
    * same shape, bigger dictionary; the last-2-labels form is the
    * standard PSL-free fallback. */
  def registrableDomain(url: Column): Column = {
    val labels = split(canonicalHost(url), "\\.")
    val n = size(labels)
    when(n <= 2, array_join(labels, "."))
      .otherwise(concat_ws(".", element_at(labels, -2), element_at(labels, -1)))
  }

  /** Canonical URL: lowercase scheme + [[canonicalHost]], port dropped
    * when it is the scheme default (https:443 / http:80; other ports
    * kept), path kept verbatim, fragment dropped, query params with
    * tracking keys (`utm_*`, `ref`, `fbclid`, `gclid`) removed and the
    * survivors SORTED so param order never splits a dup class. All
    * builtins — filter/array_sort/array_join are codegen'd, so this is
    * a pure map over the scan. */
  def canonicalUrl(url: Column): Column = {
    val scheme = lower(parse_url(url, lit("PROTOCOL")))
    val host = canonicalHost(url)
    // AUTHORITY carries the port when present; keep non-default ports
    val port = regexp_extract(parse_url(url, lit("AUTHORITY")), ":(\\d+)$", 1)
    val keepPort = port =!= "" &&
      !(scheme === "https" && port === "443") &&
      !(scheme === "http" && port === "80")
    val path = coalesce(parse_url(url, lit("PATH")), lit(""))
    val params = filter(
      split(coalesce(parse_url(url, lit("QUERY")), lit("")), "&"),
      p => p =!= "" && !p.rlike("^(utm_[^=]*|ref|fbclid|gclid)="))
    val query = array_join(array_sort(params), "&")
    concat(
      scheme, lit("://"), host,
      when(keepPort, concat(lit(":"), port)).otherwise(lit("")),
      path,
      when(query =!= "", concat(lit("?"), query)).otherwise(lit("")))
  }

  /** URL-level dedup inventory: canonicalize map-side, ONE group on the
    * canonical key. Output (canon_url, domain, n_docs, rep_doc) with
    * the deterministic min-id representative, ordered by canon_url —
    * the table a fetch/dedup stage joins back against. At 100 TB the
    * group key is a short string and the exchange carries nothing else;
    * no text, no payloads. */
  def urlDedup(docs: DataFrame, idCol: String, urlCol: String): DataFrame =
    docs.select(col(idCol).cast("long").as("doc_id"), col(urlCol).as("url"))
      .select(col("doc_id"), canonicalUrl(col("url")).as("canon_url"),
        registrableDomain(col("url")).as("domain"))
      .groupBy("canon_url", "domain")
      .agg(count(lit(1)).as("n_docs"), min(col("doc_id")).as("rep_doc"))
      .orderBy("canon_url")
}
