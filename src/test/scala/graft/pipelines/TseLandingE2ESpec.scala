package graft.pipelines

import java.nio.charset.Charset
import java.nio.file.Files
import java.util.zip.{ZipEntry, ZipOutputStream}

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.sources.{Landing, Tables}

/** The reference's FULL lifecycle from archive to final tables, through
  * the engine's own seams (VERDICT r3 #7): `Landing.landTseZip` (cached
  * fetch + ZIP expansion preferring the consolidated member, extract.py:
  * 11-50) → `Tables.tseCsv` (`;`/latin-1 distributed scan) → all four
  * `TsePipelines` (main.py:29-39 / load.py) — asserting final table state
  * including the R20 miss-warning count (load.py:123-124).
  *
  * The fixture CSVs carry an explicit `ord` column: the reference relies
  * on implicit file/statement order for keep-first semantics, which a
  * distributed scan must replace with an explicit total order (SURVEY.md
  * §2.A hazards) — the fixture makes that order part of the data.
  */
class TseLandingE2ESpec extends SparkSpec {
  import spark.implicits._

  private val latin1 = Charset.forName("ISO-8859-1")

  private def zipOf(members: (String, Seq[String])*): java.nio.file.Path = {
    val zip = Files.createTempFile("tse", ".zip")
    val zos = new ZipOutputStream(new java.io.FileOutputStream(zip.toFile))
    members.foreach { case (name, lines) =>
      zos.putNextEntry(new ZipEntry(name))
      zos.write((lines.mkString("\n") + "\n").getBytes(latin1))
      zos.closeEntry()
    }
    zos.close()
    zip
  }

  private val candHeader =
    "ord;ANO_ELEICAO;NR_TURNO;DS_ELEICAO;SQ_CANDIDATO;NR_CANDIDATO;" +
      "NM_CANDIDATO;NM_URNA_CANDIDATO;DS_CARGO;NR_PARTIDO;SG_PARTIDO;NM_PARTIDO"
  // §2.A edge cases: duplicate NR_PARTIDO with conflicting names
  // (keep-first), repeated politician across turns, party number 0,
  // latin-1 diacritics
  private val candRows = Seq(
    "1;2024;1;Eleição Municipal;1001;11;José da Silva;Zé;Prefeito;13;PT;Partido dos Trabalhadores",
    "2;2024;1;Eleição Municipal;1002;22;Maria Conceição;Maria;Prefeito;45;PSDB;Partido da Social Democracia",
    "3;2024;1;Eleição Municipal;1003;33;João Souza;João;Vereador;13;PT;NOME CONFLITANTE",
    "4;2024;2;Eleição Municipal;1001;11;José da Silva;Zé;Prefeito;13;PT;Partido dos Trabalhadores",
    "5;2024;1;Eleição Municipal;1004;44;Ana Zero;Aninha;Vereador;0;P0;Partido Zero")
  private val votesHeader = "ord;SQ_CANDIDATO;QT_VOTOS;DS_SIT_TOT_TURNO"
  private val votesRows = Seq(
    "1;1001;100;ELEITO", "2;1001;250;ELEITO",
    "3;1002;80;NÃO ELEITO",
    "4;9999;5;?") // no such candidacy -> the R20 miss warning

  test("ZIP -> landing -> tseCsv -> four pipelines -> final tables + miss count") {
    val cache = Files.createTempDirectory("e2e-cache").toString
    val landC = Files.createTempDirectory("e2e-land-cand").toString
    val landV = Files.createTempDirectory("e2e-land-votes").toString
    // candidacies archive has per-state members AND the consolidated
    // national roll-up: only the consolidated member must land
    val candZip = zipOf(
      "consulta_cand_2024_SP.csv" -> (candHeader +: candRows.take(2)),
      "nested/consulta_cand_2024_BRASIL.csv" -> (candHeader +: candRows),
      "leiame.txt" -> Seq("não é csv"))
    // votes archive has no consolidated member: every state CSV lands and
    // the scan unions them at the source
    val votesZip = zipOf(
      "votacao_candidato_munzona_2024_SP.csv" -> (votesHeader +: votesRows.take(3)),
      "votacao_candidato_munzona_2024_RJ.csv" -> (votesHeader +: votesRows.drop(3)))
    def fileFetch(src: java.nio.file.Path): java.io.OutputStream => Unit =
      out => Files.copy(src, out)

    val candDir = Landing.landTseZip(cache, landC, "consulta_cand", 2024)(fileFetch(candZip))
    val votesDir = Landing.landTseZip(cache, landV, "votacao_candidato_munzona", 2024)(fileFetch(votesZip))
    assert(new java.io.File(landC).listFiles().map(_.getName).toSeq ==
      Seq("consulta_cand_2024_BRASIL.csv"),
      "consolidated member present -> only it lands")

    val cand = Tables.tseCsv(spark, candDir + "/*.csv")
    val votes = Tables.tseCsv(spark, votesDir + "/*.csv")
    assert(cand.count() == 5 && votes.count() == 4)

    // pipeline 1: seed_parties (keep-first on duplicate party number)
    val parties = TsePipelines.seedParties(cand,
      Seq.empty[(Long, String, String)].toDF("party_number", "initials", "party_name"),
      "ord")
    assert(parties.orderBy("party_number")
      .as[(Long, String, String)].collect().toSeq == Seq(
        (0L, "P0", "Partido Zero"),
        (13L, "PT", "Partido dos Trabalhadores"),
        (45L, "PSDB", "Partido da Social Democracia")))

    // pipeline 2: seed_politicians (distinct natural keys; diacritics
    // survived ZIP -> latin-1 landing -> distributed scan)
    val politicians = TsePipelines.seedPoliticians(cand,
      Seq.empty[(String, String)].toDF("full_name", "nickname"), "ord")
    assert(politicians.count() == 4)
    assert(politicians.filter($"full_name" === "José da Silva").count() == 1)

    // pipeline 3: seed_candidacies (elections derivation + 3-way broadcast
    // join; party 0 survives — reference truthiness bug not replicated)
    val elections = TsePipelines.deriveElections(cand)
    assert(elections.filter($"turn" === 1)
      .select($"election_date".cast("string")).as[String].collect().head == "2024-10-02")
    val candidacies = TsePipelines.seedCandidacies(cand, parties, politicians, elections)
    assert(candidacies.count() == 5)
    assert(candidacies.filter($"party_number" === 0L).count() == 1)

    // pipeline 4: update_results (vote sums + deterministic first status)
    val updated = TsePipelines.updateResults(votes, candidacies, "ord")
    val bySq = updated
      .select($"sq_candidate_tse", $"turn", $"total_votes_received", $"status_resultado")
      .as[(String, Int, Option[Long], Option[String])].collect()
    assert(bySq.filter(_._1 == "1001").forall(r => r._3.contains(350L) && r._4.contains("ELEITO")),
      s"both 1001 candidacy rows (turns) get the summed votes: ${bySq.toSeq}")
    assert(bySq.find(_._1 == "1002").get._3.contains(80L))
    assert(bySq.find(_._1 == "1003").get._3.isEmpty, "no votes -> stays null")

    // R20 miss-warning count: vote key 9999 has no candidacy row
    val misses = TsePipelines.resultMisses(votes, candidacies)
      .as[String].collect().toSeq
    assert(misses == Seq("9999"),
      "exactly the orphan vote key must be reported (load.py:123-124)")
  }
}
