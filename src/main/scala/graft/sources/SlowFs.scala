package graft.sources

/** A local filesystem with PER-FILE-OPEN latency injection — the
  * measurement instrument behind the object-store pricing of the
  * small-files claim. Local NVMe opens cost microseconds, so a
  * fragmented store's per-file overhead is invisible in a local
  * bench; object stores charge 1–10 ms of first-byte latency per GET,
  * which is exactly a per-open cost. Registering this scheme
  * (`fs.slowfs.impl` = this class) and reading a store through
  * `slowfs:` URIs turns the documented fio-style model into a real
  * measured figure: every `open()` sleeps
  * `fs.slowfs.open.delay.ms` (default 0) before delegating to the
  * raw local filesystem, so the SAME bytes re-price under the
  * configured open cost while throughput stays local.
  *
  * Model scope, stated: the injection prices OPENS only (the
  * dominant fragmented-store tax); it does not model object-store
  * LIST latency or bandwidth differences. Raw (checksum-free) local
  * fs underneath — data bytes are identical to a `file:` read.
  * Set `fs.slowfs.impl.disable.cache = true` so a delay change in
  * the Hadoop conf reaches fresh instances. */
class SlowFs extends org.apache.hadoop.fs.RawLocalFileSystem {
  override def getUri: java.net.URI = java.net.URI.create("slowfs:///")

  override def open(f: org.apache.hadoop.fs.Path, bufferSize: Int)
      : org.apache.hadoop.fs.FSDataInputStream = {
    val d = getConf.getLong("fs.slowfs.open.delay.ms", 0L)
    if (d > 0L) Thread.sleep(d)
    super.open(f, bufferSize)
  }
}
