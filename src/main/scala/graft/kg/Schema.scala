package graft.kg

import java.sql.Timestamp

/** Typed row models (Dataset[T] end-to-end — BASELINE.json input_hint). */
object Schema {

  /** Input table shape (BASELINE.json `input_hint`): Common-Crawl-style
    * web pages. */
  final case class Page(
      url: String,
      warc_ts: Timestamp,
      html: Array[Byte],
      text: String,
      lang: String)

  /** Slim single-scan intermediate: raw text extracted per url (html
    * decoded at most once; the html column never travels further). */
  final case class RawDoc(
      url: String,
      warc_ts: Timestamp,
      lang: String,
      raw_text: String)

  /** Stage-1 output: extracted + cleaned text per url. */
  final case class CleanDoc(
      url: String,
      warc_ts: Timestamp,
      lang: String,
      raw_text: String,
      clean_text: String)

  /** Stage-2 output: one (subj=url, pred, obj) triple candidate with
    * provenance. `kind` disambiguates mentionsEntity families
    * (acronym/concept/technique — SURVEY §2.9 E7-E9). */
  final case class Triple(
      url: String,
      pred: String,
      obj: String,
      kind: String,
      surface: String,
      context: String,
      weight: Int)

  /** Stage-3: mention linked to a normalized entity key. */
  final case class LinkedMention(
      url: String,
      pred: String,
      entity_key: String,
      surface: String,
      kind: String,
      weight: Int)

  /** Stage-4 output: canonical entity node. */
  final case class Node(
      entity_id: Long,
      canonical_name: String,
      kind: String,
      aliases: Seq[String],
      n_mentions: Long,
      n_urls: Long)

  /** Stage-5 output: edge url→entity (or url→literal for attrs). */
  final case class Edge(
      src_url: String,
      pred: String,
      dst_id: Long,
      dst_name: String,
      weight: Long)

  /** Per-partition lineage/metrics row (north_rule: per-partition
    * lineage + metrics). */
  final case class PartitionMetric(
      stage: String,
      partition_id: Int,
      rows: Long,
      wall_ms: Long)
}
