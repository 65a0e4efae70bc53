package graft

import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}

import org.scalatest.BeforeAndAfterAll

import graft.serve.HttpApi

/** In-process HTTP front-door tests on the toy fixture (the reference's
  * endpoint surface: `tp2/app/main.py:27-89`, `tp1 api.py:54-96`). */
class ServeSpec extends SparkSpec with BeforeAndAfterAll {

  private lazy val api = new HttpApi(spark, Fixtures.write(spark))
  private lazy val port = api.start()
  private lazy val client = HttpClient.newHttpClient()

  override def afterAll(): Unit = api.stop()

  private def get(path: String): (Int, String) = {
    val req = HttpRequest
      .newBuilder(URI.create(s"http://127.0.0.1:$port$path")).GET().build()
    val resp = client.send(req, HttpResponse.BodyHandlers.ofString())
    (resp.statusCode(), resp.body())
  }

  test("GET /health is a liveness probe") {
    val (code, body) = get("/health")
    assert(code == 200 && body.contains("\"ok\":true"), body)
  }

  test("GET / lists the endpoints") {
    val (code, body) = get("/")
    assert(code == 200 && body.contains("\"/recs\""), body)
  }

  test("GET /recs defaults to co_occurrence with the tp2 envelope") {
    val (code, body) = get("/recs")
    assert(code == 200, body)
    assert(body.contains("\"strategy\":\"co_occurrence\""), body)
    assert(body.contains("\"recommendations\":[{"), body)
    assert(body.contains("\"product_id\":"), body)
  }

  test("GET /recs with similarity + customer_id dispatches the 3-hop path") {
    val (code, body) = get("/recs?strategy=similarity&customer_id=1&limit=5")
    assert(code == 200, body)
    assert(body.contains("\"customer_id\":1"), body)
  }

  test("GET /recs with an unknown strategy is a 400 with detail") {
    val (code, body) = get("/recs?strategy=bogus")
    assert(code == 400 && body.contains("Unknown strategy"), body)
  }

  test("GET /customers/{id}/recommendations carries the contributions map") {
    val (code, body) = get("/customers/1/recommendations?top_n=3")
    assert(code == 200, body)
    assert(body.contains("\"contributions\":{\"co_occurrence\":"), body)
    assert(body.contains("\"personalized_pagerank\":"), body)
  }

  test("GET /customers/{id}/recommendations for an unknown customer is 404") {
    val (code, body) = get("/customers/9999/recommendations")
    assert(code == 404 && body.contains("unknown customer"), body)
  }

  test("non-numeric customer id and junk top_n degrade gracefully") {
    val (code, _) = get("/customers/abc/recommendations")
    assert(code == 404)
    val (code2, body2) = get("/customers/1/recommendations?top_n=abc")
    assert(code2 == 200, body2) // unparseable top_n falls back to default 3
  }

  test("per-request caches are released after serving (no cache leak)") {
    // request 1 may materialize session builders (incidence, cooc,
    // jaccard pairs, the memoized PPR ranks) — one-time by design; the
    // leak property is STEADY STATE: repeated identical requests must
    // add zero cache entries (per-request seeds/candidates released,
    // memoized builders hit, nothing re-marked)
    get("/customers/1/recommendations?top_n=3") // warm-up
    val before = spark.sparkContext.getPersistentRDDs.size
    (1 to 3).foreach(_ => get("/customers/1/recommendations?top_n=3"))
    val after = spark.sparkContext.getPersistentRDDs.size
    assert(after == before, s"cache entries grew $before -> $after")
  }

  test("N parallel requests: correct per-customer results, bounded cache") {
    // the round-12 verdict's serving-concurrency check: the server is
    // single-flight by construction (HttpApi scaladoc — dispatcher-thread
    // executor paired with cacheOnce's serialized-requests contract), so
    // CONCURRENT CLIENTS must observe (a) every response byte-identical
    // to its serial baseline (scores are deterministic, so any
    // interleaving artifact — a dropped shared cache entry, a torn
    // per-request release — would show as a changed body), and (b) zero
    // steady-state cache growth after the whole burst.
    val paths = Seq(
      "/customers/1/recommendations?top_n=3",
      "/customers/2/recommendations?top_n=3",
      "/customers/1/strategies?top_n=2",
      "/recs?strategy=similarity&customer_id=1&limit=5")
    val baseline = paths.map(p => p -> get(p)).toMap // serial, warms memos
    val before = spark.sparkContext.getPersistentRDDs.size
    val pool = java.util.concurrent.Executors.newFixedThreadPool(8)
    implicit val ec: scala.concurrent.ExecutionContext =
      scala.concurrent.ExecutionContext.fromExecutor(pool)
    val burst = scala.concurrent.Future.sequence(
      (1 to 24).map { i =>
        val p = paths(i % paths.length)
        scala.concurrent.Future((p, get(p)))
      })
    val results = scala.concurrent.Await.result(
      burst, scala.concurrent.duration.Duration(120, "s"))
    pool.shutdown()
    results.foreach { case (p, (code, body)) =>
      assert(code == 200, s"$p -> $code: $body")
      assert((code, body) == baseline(p),
        s"$p diverged under concurrency:\n got $body\n exp ${baseline(p)._2}")
    }
    val after = spark.sparkContext.getPersistentRDDs.size
    assert(after == before, s"cache entries grew $before -> $after")
  }

  test("GET /customers/{id}/strategies returns the per-strategy breakdown") {
    val (code, body) = get("/customers/1/strategies?top_n=2")
    assert(code == 200, body)
    assert(body.contains("\"personalized_pagerank\":["), body)
    assert(body.contains("\"co_occurrence\":["), body)
  }

  test("SURVEY §3.1 goldens through HTTP: C1 all-excluded empty, " +
      "C3 seeded blend") {
    // serve the EXACT reference toy graph (incidence includes the
    // event→product edges the parquet schema cannot carry) so the HTTP
    // layer pins the same goldens EngineSpec pins at the engine level
    val toyApi = new HttpApi(spark, Fixtures.write(spark),
      graph = Some(Fixtures.toyGraph(spark)))
    val toyPort = toyApi.start()
    def toyGet(path: String): (Int, String) = {
      val req = HttpRequest
        .newBuilder(URI.create(s"http://127.0.0.1:$toyPort$path"))
        .GET().build()
      val resp = client.send(req, HttpResponse.BodyHandlers.ofString())
      (resp.statusCode(), resp.body())
    }
    try {
      // C1 purchased {P1,P2,P4} and interacted with {P3}: every catalog
      // product is excluded → empty list, HTTP 200 (tp1/main.py:21-24)
      val (c1Code, c1Body) = toyGet("/customers/1/recommendations")
      assert(c1Code == 200, c1Body)
      assert(c1Body.contains("\"recommendations\":[]"), c1Body)
      // C3 (event-only seed {P1}): golden [(P2,1.0),(P4,0.427511),(P3,0.3)]
      val (c3Code, c3Body) = toyGet("/customers/3/recommendations")
      assert(c3Code == 200, c3Body)
      val item = """"product_id":(\d+),"score":([-0-9.eE]+)""".r
      val items = item.findAllMatchIn(c3Body)
        .map(m => (m.group(1).toLong, m.group(2).toDouble)).toList
      assert(items.map(_._1) == List(2L, 4L, 3L), c3Body)
      val golden = List(1.0, 0.427511, 0.3)
      items.zip(golden).foreach { case ((pid, score), want) =>
        assert(math.abs(score - want) < 2e-6, s"P$pid score $score")
      }
      // and C3's P3 row carries a zero PPR contribution (unreachable
      // sink under seeded PPR) — the contributions map survives the
      // JSON envelope intact
      val contrib =
        (""""product_id":3,[^}]*"personalized_pagerank":([-0-9.eE]+)""").r
      assert(contrib.findFirstMatchIn(c3Body)
        .exists(_.group(1).toDouble == 0.0), c3Body)
    } finally toyApi.stop()
  }
}
