package graft.http

import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}

import graft.SparkSuite

class HttpApiSpec extends SparkSuite {

  private lazy val api = {
    spark.read.parquet(s"$sf0001/embeddings.parquet")
      .createOrReplaceTempView("embeddings")
    new HttpApi(spark).start()
  }
  private lazy val base = s"http://localhost:${api.boundPort}"
  private lazy val client = HttpClient.newHttpClient()

  private def get(path: String): HttpResponse[String] =
    client.send(HttpRequest.newBuilder(URI.create(base + path)).GET().build(),
      HttpResponse.BodyHandlers.ofString())

  private def post(path: String, body: String): HttpResponse[String] =
    client.send(HttpRequest.newBuilder(URI.create(base + path))
      .POST(HttpRequest.BodyPublishers.ofString(body)).build(),
      HttpResponse.BodyHandlers.ofString())

  test("GET /collections lists registered tables") {
    val r = get("/collections")
    assert(r.statusCode() === 200)
    assert(r.body().contains("\"embeddings\""))
  }

  test("GET /collections/{name} describes schema and rows") {
    val r = get("/collections/embeddings")
    assert(r.statusCode() === 200)
    assert(r.body().contains("\"rows\":500"))
    assert(r.body().contains("\"type\":\"array<float>\""))
  }

  test("POST search by vector returns ranked neighbors") {
    val vec = (1 to 64).map(_ => "0.1").mkString(",")
    val r = post("/collections/embeddings/search",
      s"""{"vector":[$vec],"k":3}""")
    assert(r.statusCode() === 200)
    assert(r.body().contains("\"rank\":1") && r.body().contains("\"rank\":3"))
  }

  test("POST search by text embeds the query (reference search path)") {
    val r = post("/collections/embeddings/search",
      """{"text":"fast key order scan","k":2,"metric":"cos"}""")
    assert(r.statusCode() === 200)
    assert(r.body().contains("\"results\":[{\"id\":"))
  }

  test("404 on unknown collection; 400 on missing vector/text") {
    assert(get("/collections/nope").statusCode() === 404)
    val r = post("/collections/embeddings/search", """{"k":3}""")
    assert(r.statusCode() === 400)
  }
}
