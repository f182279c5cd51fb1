package graft.pipelines

import org.apache.spark.sql.functions._

import graft.GraftSession
import graft.sources.Tables

/** Runnable end-to-end replay of the reference's four pipelines over a
  * TSE-shaped CSV (sep=';', latin-1 — the reference's input contract).
  *
  * Usage: runMain graft.pipelines.TseDemo [candCsvPath votesCsvPath]
  * With no args, writes a small latin-1 fixture to a temp dir first, so
  * the demo (and the verify recipe) is self-contained.
  */
object TseDemo {

  def main(args: Array[String]): Unit = {
    val spark = GraftSession.local(4)
    import spark.implicits._

    val (candPath, votesPath) = if (args.length >= 2) (args(0), args(1)) else {
      val dir = java.nio.file.Files.createTempDirectory("tse_demo")
      val cand = dir.resolve("consulta_cand_2024.csv")
      val votes = dir.resolve("votacao_2024.csv")
      java.nio.file.Files.write(cand,
        ("ANO_ELEICAO;NR_TURNO;DS_ELEICAO;SQ_CANDIDATO;NR_CANDIDATO;NM_CANDIDATO;NM_URNA_CANDIDATO;DS_CARGO;NR_PARTIDO;SG_PARTIDO;NM_PARTIDO\n" +
         "2024;1;Eleição Municipal;1001;11;José da Silva;Zé;Prefeito;13;PT;Partido dos Trabalhadores\n" +
         "2024;1;Eleição Municipal;1002;22;Maria Conceição;Maria;Prefeito;45;PSDB;Partido da Social Democracia\n" +
         "2024;2;Eleição Municipal;1001;11;José da Silva;Zé;Prefeito;13;PT;Partido dos Trabalhadores\n" +
         "2024;1;Eleição Municipal;1004;44;Ana Zero;Aninha;Vereador;0;P0;Partido Zero\n")
          .getBytes("ISO-8859-1"))
      java.nio.file.Files.write(votes,
        ("SQ_CANDIDATO;QT_VOTOS;DS_SIT_TOT_TURNO\n" +
         "1001;100;ELEITO\n1001;250;ELEITO\n1002;80;NÃO ELEITO\n9999;5;?\n")
          .getBytes("ISO-8859-1"))
      (cand.toString, votes.toString)
    }

    val cand = Tables.tseCsv(spark, candPath)
      .withColumn("ord", monotonically_increasing_id())
    val votes = Tables.tseCsv(spark, votesPath)
      .withColumn("ord", monotonically_increasing_id())

    val parties = TsePipelines.seedParties(cand,
      Seq.empty[(Long, String, String)].toDF("party_number", "initials", "party_name"), "ord")
    val politicians = TsePipelines.seedPoliticians(cand,
      Seq.empty[(String, String)].toDF("full_name", "nickname"), "ord")
    val elections = TsePipelines.deriveElections(cand)
    val candidacies = TsePipelines.seedCandidacies(cand, parties, politicians, elections)
    val results = TsePipelines.updateResults(votes, candidacies, "ord")
    val misses = TsePipelines.resultMisses(votes, candidacies)

    println("=== parties ===");      parties.orderBy("party_number").show(false)
    println("=== politicians ===");  politicians.orderBy("full_name").show(false)
    println("=== elections ===");    elections.orderBy("turn").show(false)
    println("=== candidacies+results ===")
    results.orderBy("sq_candidate_tse", "turn").show(false)
    println("=== vote keys with no candidacy (reference miss-warning) ===")
    misses.show(false)
    spark.stop()
  }
}
