package graft.tools

import graft.kg.{PagesGen, Pipeline, RefAnalyzers, RefText}

/** Single-threaded per-extractor microbenchmark over the synthetic corpus
  * (finds the CPU hotspots that dominate docs/sec/core at scale). */
object ProfileExtractors {
  def main(args: Array[String]): Unit = {
    val n = if (args.nonEmpty) args(0).toInt else 2000
    val docs = (0L until n.toLong).map(PagesGen.docText).toArray

    def time(name: String)(f: String => Any): Unit = {
      // warmup
      docs.take(200).foreach(f)
      val t0 = System.nanoTime()
      docs.foreach(f)
      val ms = (System.nanoTime() - t0) / 1e6
      println(f"$name%-22s ${ms / n}%8.3f ms/doc  (${n / (ms / 1000)}%8.0f docs/sec/core)")
    }

    time("cleanText")(RefText.cleanText)
    time("createChunks")(t => RefText.createChunks(RefText.cleanText(t)))
    time("computeStats")(RefAnalyzers.computeStats)
    time("extractSummary")(RefAnalyzers.extractSummary(_))
    time("extractKeywords")(RefAnalyzers.extractKeywords(_))
    time("technicalTerms")(RefAnalyzers.extractTechnicalTerms(_))
    time("figureRefs")(RefAnalyzers.extractFigureRefs)
    time("metadata")(RefAnalyzers.extractMetadata)
    time("sections")(RefAnalyzers.extractSections)
    time("equations")(RefAnalyzers.extractEquations)
    time("ALL (triplesForDoc)")(t => Pipeline.triplesForDoc("u", t))
  }
}
