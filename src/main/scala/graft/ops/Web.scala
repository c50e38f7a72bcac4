package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Web-graph operators over Common-Crawl-style pages: href extraction
  * from raw html and the aggregated host-level link graph — the map
  * step of a crawl-scale webgraph build (the input the PageRank /
  * CC / community operators in [[Graph]] consume at host granularity).
  * Pure `functions._` column programs — codegen'd, engine-portable.
  *
  * Scale shape: one narrow regex explode per page (bounded by the
  * page's own anchor count), then a single partial-aggregated shuffle
  * keyed by (src_host, dst_host) — hot host pairs (every page of a big
  * site linking the same CDN) combine map-side, so no reducer sees more
  * than the distinct host-pair count. At 10^12 pages the host graph is
  * ~10^8 rows — small enough to broadcast into downstream joins. */
object Web {

  /** Absolute-link hosts from an html column: every
    * `href="http(s)://<host>/..."` target's host, lowercased.
    * Relative links carry no host and are skipped — resolving them
    * against the page url is the caller's join (they never leave the
    * page's own host). */
  def linkHosts(html: Column): Column =
    transform(
      regexp_extract_all(html, lit("href=\"https?://([^/\"]+)"), lit(1)),
      h => lower(h))

  /** URL canonicalization — the key-normalization step in front of any
    * per-url dedup/join in a crawl pipeline (the same page arrives as
    * `HTTP://Host.COM:80/p?utm_source=x#f` and `http://host.com/p`):
    *   1. fragment stripped,
    *   2. scheme and host lowercased (path/query case preserved — they
    *      are case-significant on most servers),
    *   3. default port dropped (`:80` for http, `:443` for https),
    *   4. tracking params removed (`utm_*`, `fbclid`, `gclid`),
    *      remaining params kept in original order, a now-empty query
    *      dropped entirely,
    *   5. an empty path normalized to `/`.
    * Pure regexp column program (split → normalize parts → reassemble)
    * — codegen'd, narrow, engine-portable; non-url strings (no
    * `scheme://`) pass through unchanged except fragment removal. */
  def normalizeUrl(url: Column): Column = {
    val noFrag = regexp_replace(url, "#.*$", "")
    val scheme = lower(regexp_extract(noFrag, "^([A-Za-z][A-Za-z0-9+.-]*)://", 1))
    val auth = lower(regexp_extract(noFrag, "^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]*)", 1))
    val host = when(scheme === "http", regexp_replace(auth, ":80$", ""))
      .when(scheme === "https", regexp_replace(auth, ":443$", ""))
      .otherwise(auth)
    val rest = regexp_extract(noFrag, "^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*([^#]*)", 1)
    val path = regexp_extract(rest, "^([^?]*)", 1)
    val query = regexp_extract(rest, "\\?(.*)$", 1)
    val keptQ = array_join(
      filter(split(query, "&"),
        p => !p.rlike("^(utm_[^=]*|fbclid|gclid)=")), "&")
    when(scheme === "", noFrag).otherwise(concat(
      scheme, lit("://"), host,
      when(path === "", lit("/")).otherwise(path),
      when(keptQ === "", lit("")).otherwise(concat(lit("?"), keptQ))))
  }

  /** Host-level link graph: (src_host, dst_host, n_links) with every
    * absolute anchor counted once (multi-edges aggregate into the
    * weight — the shape PageRank's weighted edges expect). */
  def hostEdges(df: DataFrame, srcHost: Column, html: Column): DataFrame =
    df.select(srcHost.as("src_host"), explode(linkHosts(html)).as("dst_host"))
      .groupBy(col("src_host"), col("dst_host"))
      .agg(count(lit(1)).as("n_links"))

  /** (dst_host, anchor text) pairs from absolute links — anchor text is
    * THE web-scale alias source for entity linking (what the crawl calls
    * a page is evidence for what the entity behind it is named; the
    * reference builds its alias table from document text,
    * `/root/reference/app_enhanced.py` term extraction — a crawl builds
    * it from anchors). Two-step extract: explode whole `<a …
    * href="http(s)://…">text</a>` tags (ONE regex pass per page, bounded
    * by the page's anchor count), then per-tag host + inner-text
    * extraction on the short tag strings. Empty/whitespace-only anchors
    * drop. Output: (dst_host, anchor, n_refs) — one partial-aggregated
    * shuffle; hot (host, anchor) pairs combine map-side. */
  def anchorPairs(df: DataFrame, html: Column): DataFrame =
    df.select(explode(regexp_extract_all(html,
        lit("<a [^>]*href=\"https?://[^\"]*\"[^>]*>[^<]*</a>"), lit(0))).as("tag"))
      .select(
        lower(regexp_extract(col("tag"), "href=\"https?://([^/\"]+)", 1)).as("dst_host"),
        trim(regexp_extract(col("tag"), ">([^<]*)</a>$", 1)).as("anchor"))
      .where(col("anchor") =!= "")
      .groupBy(col("dst_host"), col("anchor"))
      .agg(count(lit(1)).as("n_refs"))

  /** Multi-label public suffixes recognized by [[registeredDomain]] —
    * a deliberately small built-in subset of the public-suffix list
    * covering the common ccTLD second-level registries (the full list
    * is data, not code: at deployment it arrives as a broadcast lookup
    * table; the FALLBACK heuristic — last two labels, three under a
    * known two-label suffix — is what this column program pins). */
  private val twoLabelSuffixes = Seq(
    "co.uk", "ac.uk", "gov.uk", "org.uk", "co.jp", "ne.jp", "or.jp",
    "com.au", "net.au", "org.au", "com.br", "com.cn", "co.in", "co.kr",
    "com.mx", "co.za", "com.ar", "com.tr")

  /** Registered domain (site owner) from a host name — the grouping key
    * per-source curation actually wants (`sub.a.example.co.uk` and
    * `example.co.uk` are the same publisher; bare hosts and IPv4
    * literals pass through unchanged). Pure array/when column program —
    * codegen'd, engine-portable. */
  def registeredDomain(host: Column): Column = {
    val h = lower(host)
    val parts = split(h, "\\.")
    val last2 = concat_ws(".", slice(parts, -2, 2))
    val last3 = concat_ws(".", slice(parts, -3, 3))
    when(h.rlike("^[0-9.]+$") || size(parts) <= 2, h)
      .when(last2.isin(twoLabelSuffixes: _*), last3)
      .otherwise(last2)
  }

  /** SURT key (Sort-friendly URI Reordering Transform) — the canonical
    * key format of web-archive URL indexes (CDX): everything lowercased,
    * host labels REVERSED and comma-joined so one owner's urls sort
    * adjacent (`com,example,www2` next to `com,example`), leading `www.`
    * and the port dropped, fragment dropped, query params SORTED so
    * param order doesn't split identical resources. `com,example)/p?a=1`
    * is THE range-partitioning key a 10^12-row url index wants: per-site
    * scans become contiguous key ranges. Pure column program — codegen'd;
    * non-url strings pass through unchanged. */
  def surtKey(url: Column): Column = {
    val noFrag = regexp_replace(url, "#.*$", "")
    val auth = lower(regexp_extract(noFrag, "^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]*)", 1))
    val host = regexp_replace(regexp_replace(auth, ":[0-9]+$", ""), "^www\\.", "")
    val revHost = concat_ws(",", reverse(split(host, "\\.")))
    val rest = lower(regexp_extract(noFrag, "^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*([^#]*)", 1))
    val path = regexp_extract(rest, "^([^?]*)", 1)
    val query = regexp_extract(rest, "\\?(.*)$", 1)
    val sortedQ = array_join(array_sort(split(query, "&")), "&")
    when(auth === "", noFrag).otherwise(concat(
      revHost, lit(")"),
      when(path === "", lit("/")).otherwise(path),
      when(sortedQ === "", lit("")).otherwise(concat(lit("?"), sortedQ))))
  }

  /** RFC 3986 §5.2.4 dot-segment removal — the buffer algorithm
    * verbatim (`/a/b/../c` → `/a/c`, excess `..` clamps at root,
    * trailing `/.`/`/..` keep the directory slash). */
  def removeDotSegments(input: String): String = {
    var in = input
    val out = new StringBuilder
    def trimLastSeg(): Unit = {
      val i = out.lastIndexOf("/")
      out.setLength(if (i < 0) 0 else i)
    }
    while (in.nonEmpty) {
      if (in.startsWith("../")) in = in.substring(3)
      else if (in.startsWith("./")) in = in.substring(2)
      else if (in.startsWith("/./")) in = "/" + in.substring(3)
      else if (in == "/.") in = "/"
      else if (in.startsWith("/../")) { in = "/" + in.substring(4); trimLastSeg() }
      else if (in == "/..") { in = "/"; trimLastSeg() }
      else if (in == "." || in == "..") in = ""
      else {
        val start = if (in.startsWith("/")) 1 else 0
        val next = in.indexOf('/', start)
        val seg = if (next < 0) in else in.substring(0, next)
        out.append(seg)
        in = if (next < 0) "" else in.substring(next)
      }
    }
    out.toString
  }

  private val UrlRe =
    "^([A-Za-z][A-Za-z0-9+.-]*)://([^/?#]*)([^?#]*)(\\?[^#]*)?".r

  /** RFC 3986 §5.3 reference resolution — what turns the RELATIVE hrefs
    * [[linkHosts]] skips into fetchable urls (absolute refs, `//`
    * network-path, `/` rooted, `dir`-relative with dot-segment merge,
    * bare `?query` and `#fragment` refs). Fragments never fetch, so
    * they are stripped from the result; an opaque non-hierarchical ref
    * (`mailto:…`) passes through; a null/unparseable base resolves to
    * null (caller drops). Scalar kernel + [[resolveRefCol]] — per-row
    * string work, no regex compilation in the loop beyond the anchored
    * split pattern. */
  def resolveRef(base: String, ref0: String): String = {
    if (base == null || ref0 == null) return null
    val ref = { val i = ref0.indexOf('#'); if (i < 0) ref0 else ref0.substring(0, i) }
    def split3(u: String): Option[(String, String, String, String)] =
      UrlRe.findFirstMatchIn(u).map(m => (m.group(1), m.group(2),
        Option(m.group(3)).getOrElse(""), Option(m.group(4)).getOrElse("")))
    split3(base) match {
      case None => null
      case Some((bs, ba, bp, bq)) =>
        split3(ref) match {
          case Some((rs, ra, rp, rq)) => return s"$rs://$ra${removeDotSegments(rp)}$rq"
          case None                   => ()
        }
        if (ref.matches("^[A-Za-z][A-Za-z0-9+.-]*:.*")) ref // opaque (mailto:)
        else if (ref.startsWith("//")) split3(s"$bs:$ref") match {
          case Some((_, ra, rp, rq)) => s"$bs://$ra${removeDotSegments(rp)}$rq"
          case None                  => null
        }
        else if (ref.isEmpty) s"$bs://$ba$bp$bq"
        else if (ref.startsWith("?")) s"$bs://$ba$bp$ref"
        else {
          val merged =
            if (ref.startsWith("/")) ref
            else {
              val dir = if (bp.isEmpty) "/" else bp.substring(0, bp.lastIndexOf('/') + 1)
              dir + ref
            }
          val qi = merged.indexOf('?')
          val (p, q) = if (qi >= 0) (merged.substring(0, qi), merged.substring(qi))
            else (merged, "")
          s"$bs://$ba${removeDotSegments(p)}$q"
        }
    }
  }

  /** Column form of [[resolveRef]]. */
  val resolveRefCol: (Column, Column) => Column = {
    val u = udf((b: String, r: String) => resolveRef(b, r))
    (base, ref) => u(base, ref)
  }

  /** Sitemap entry extraction — the other url-discovery source next to
    * anchors: `<url>` blocks → (loc, lastmod, priority), whitespace
    * tolerated inside tags, missing optional fields null. One regex
    * explode per sitemap (bounded by its own entry count, the sitemap
    * protocol caps files at 50k urls), then short per-entry extracts —
    * same two-step shape as [[anchorPairs]]. */
  def sitemapEntries(df: DataFrame, xml: Column): DataFrame =
    df.select(explode(regexp_extract_all(xml,
        lit("(?s)<url>.*?</url>"), lit(0))).as("entry"))
      .select(
        trim(regexp_extract(col("entry"), "(?s)<loc>\\s*(.*?)\\s*</loc>", 1)).as("loc"),
        when(length(regexp_extract(col("entry"),
          "(?s)<lastmod>\\s*(.*?)\\s*</lastmod>", 1)) > 0,
          trim(regexp_extract(col("entry"),
            "(?s)<lastmod>\\s*(.*?)\\s*</lastmod>", 1))).as("lastmod"),
        when(length(regexp_extract(col("entry"),
          "(?s)<priority>\\s*(.*?)\\s*</priority>", 1)) > 0,
          trim(regexp_extract(col("entry"),
            "(?s)<priority>\\s*(.*?)\\s*</priority>", 1)).cast("double")).as("priority"))
      .where(col("loc") =!= "")

  // the (?=[\s/>]) boundary pins the tag NAME: without it "p" also
  // matched <pre>/<picture>/<param> and "li" matched <link>, splitting
  // prose blocks around inline/void elements on real HTML
  private val BlockTagRe =
    "(?i)</?(?:p|div|h[1-6]|li|ul|ol|table|tr|td|section|article|header|footer|nav|aside|main|br)(?=[\\s/>])[^>]*>"

  /** Main-content extraction — the density-based block classifier
    * (boilerpipe/jusText family, published heuristics) that separates
    * article text from navigation/footer chrome, where the regex
    * tag-strip alone keeps every "Home About Contact" in the corpus:
    * split on block-level tags, keep blocks with ≥ `minWords` words AND
    * link density ≤ `maxLinkDensity` (boilerplate blocks are short or
    * link-dominated — both signals are per-block, no DOM needed), join
    * survivors tag-stripped and whitespace-normalized. Pure column
    * program over higher-order array functions — codegen-friendly,
    * zero shuffles, one pass per page. */
  def mainContent(html: Column, minWords: Int = 10,
      maxLinkDensity: Double = 0.34): Column = {
    def wordCount(text: Column): Column =
      size(filter(split(text, "\\s+"), w => w =!= ""))
    val kept = filter(split(html, BlockTagRe), b => {
      val words = wordCount(regexp_replace(b, "<[^>]*>", " "))
      val linkWords = wordCount(array_join(
        regexp_extract_all(b, lit("(?s)<a [^>]*>(.*?)</a>"), lit(1)), " "))
      words >= minWords && linkWords * lit(1.0) <= words * lit(maxLinkDensity)
    })
    trim(regexp_replace(
      array_join(transform(kept,
        b => trim(regexp_replace(b, "<[^>]*>", " "))), " "),
      "\\s+", " "))
  }

  /** Host-name hygiene signals — the crawl-frontier spam/DGA heuristic
    * (published shape: algorithmically generated hosts have long,
    * high-entropy, digit-heavy labels; human-named ones don't): per
    * host, the first label's length, digit ratio, and character-level
    * entropy. Entropy uses the repo's integer-log idiom (micro-nat
    * `floor(1e6·cnt·ln(n/cnt))` terms, integer-summed, `div n`) so the
    * value is bit-stable cross-engine. Scale shape: hosts tables are
    * ~10^8 rows at crawl scale — two partial-agg shuffles (host×char,
    * then host), both tiny next to any page-table op. Output: (host,
    * label, label_len, digit_ratio, entropy_micronats). */
  def hostNameSignals(hosts: DataFrame, host: String): DataFrame = {
    val base = hosts.select(col(host).cast("string").as("host"),
      regexp_extract(col(host), "^([^.]+)", 1).as("label"))
    val counts = base
      .select(col("host"), col("label"),
        explode(filter(split(col("label"), ""), c => c =!= "")).as("ch"))
      .groupBy(col("host"), col("label"), col("ch"))
      .agg(count(lit(1)).as("cnt"))
    counts.groupBy(col("host"), col("label"))
      .agg(sum(col("cnt")).as("n"), collect_list(col("cnt")).as("cs"))
      .select(col("host"), col("label"),
        length(col("label")).as("label_len"),
        round(regexp_count(col("label"), lit("[0-9]")) * lit(1.0)
          / length(col("label")), 4).as("digit_ratio"),
        expr("aggregate(cs, 0L, (acc, c) -> acc + CAST(floor(1000000.0 * c * " +
          "ln(CAST(n AS DOUBLE) / c)) AS LONG)) div n").as("entropy_micronats"))
  }

  /** Mirror-site detection — hosts whose url PATH SETS contain each
    * other (mirrors, CDNs fronting the same site, scraped clones):
    * path-set containment between host pairs via the same postings-join
    * core as Dedup.containmentPairs, with units = distinct (host, path)
    * — never all-pairs hosts; universally-present paths (`/`,
    * `/robots.txt` — host frequency > hostCap) are pruned first so they
    * can't square the join. Output: (host1, host2, shared_units,
    * c_1_in_2, c_2_in_1). */
  def mirrorHosts(pages: DataFrame, host: String, path: String,
      threshold: Double, hostCap: Int = 1000): DataFrame =
    graft.ops.Dedup.containmentFromUnits(
        pages.select(col(host).cast("string").as("host"),
          col(path).cast("string").as("path")).distinct(),
        "host", "path", hostCap, threshold, "mirror_paths")
      .withColumnRenamed("id1", "host1").withColumnRenamed("id2", "host2")

  /** Alias table from anchor pairs: for each anchor text, the host the
    * web most often labels with it (tie → greatest host — a plain
    * `max(struct(n_refs, dst_host))` partial aggregation, the repo's
    * argmax idiom: no per-anchor window sort for a hot anchor like
    * "here" to straggle on). Output: (anchor, dst_host, n_refs). */
  def anchorAliases(pairs: DataFrame): DataFrame =
    pairs.groupBy(col("anchor"))
      .agg(max(struct(col("n_refs"), col("dst_host"))).as("top"))
      .select(col("anchor"), col("top.dst_host").as("dst_host"),
        col("top.n_refs").as("n_refs"))
}
