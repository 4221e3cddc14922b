package graft.sources

import java.io.{File, FileOutputStream, InputStream}
import java.net.{URI, URLConnection}
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Parallel retrying file downloader — the reference's `sink_files`
  * (`scrape_newest_baci_data.R:56-80`): 4 workers, 3 retries, 2 s
  * backoff, 60 s timeout, custom User-Agent, overwrite-on-exists.
  *
  * Spark shape: the URL list (metadata-scale) is repartitioned to the
  * worker cap and downloaded in `mapPartitions` on executors — the same
  * process boundary as the reference's `future::plan(multisession,
  * workers=4)`, but executor-distributed. Returns a status DataFrame
  * rather than performing a blind foreach, so the caller can assert
  * on / persist the outcome (and the reference's known bug — downloads
  * silently not happening, `scrape_newest_baci_data.R:6-7` — cannot
  * recur unnoticed).
  *
  * URLs use `URLConnection`, so `file:` fixtures exercise the full
  * retry/overwrite path in the zero-egress build; `http(s):` works
  * unchanged at deployment.
  */
object HttpSink {

  final case class DownloadResult(url: String, dest: String, ok: Boolean,
                                  attempts: Int, bytes: Long, error: String)

  def download(spark: SparkSession, urlDest: Seq[(String, String)],
               workers: Int = 4, retries: Int = 3, backoffMs: Long = 2000,
               timeoutMs: Int = 60000,
               userAgent: String = "graft-ingest/1.0"): DataFrame = {
    import spark.implicits._
    val b = backoffMs; val t = timeoutMs; val r = retries; val ua = userAgent
    spark.createDataset(urlDest)
      .repartition(workers)
      .mapPartitions { it =>
        it.map { case (url, dest) => fetchOne(url, dest, r, b, t, ua) }
      }
      .toDF()
  }

  /** One URL with the reference's retry loop: up to `retries` attempts,
    * fixed backoff, overwrite semantics (`write_disk(overwrite=TRUE)`).
    */
  def fetchOne(url: String, dest: String, retries: Int, backoffMs: Long,
               timeoutMs: Int, userAgent: String): DownloadResult = {
    var attempt = 0
    var lastErr = ""
    while (attempt < retries) {
      attempt += 1
      try {
        val conn: URLConnection = URI.create(url).toURL.openConnection()
        conn.setConnectTimeout(timeoutMs)
        conn.setReadTimeout(timeoutMs)
        conn.setRequestProperty("User-Agent", userAgent)
        val in: InputStream = conn.getInputStream
        try {
          val f = new File(dest)
          Option(f.getParentFile).foreach(_.mkdirs())
          val out = new FileOutputStream(f) // overwrite
          try {
            val buf = new Array[Byte](64 * 1024)
            var n = in.read(buf)
            var total = 0L
            while (n >= 0) {
              out.write(buf, 0, n); total += n; n = in.read(buf)
            }
            return DownloadResult(url, dest, ok = true, attempt, total, "")
          } finally out.close()
        } finally in.close()
      } catch {
        case e: Throwable =>
          lastErr = Option(e.getMessage).getOrElse(e.getClass.getSimpleName)
          if (attempt < retries) Thread.sleep(backoffMs)
      }
    }
    DownloadResult(url, dest, ok = false, attempt, 0L, lastErr)
  }
}
