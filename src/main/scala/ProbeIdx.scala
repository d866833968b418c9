package graft.operators
object ProbeIdx {
  def main(args: Array[String]): Unit = {
    val s = graft.GraftSession.local(32)
    def time[A](tag: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"PROBE $tag ${(System.nanoTime()-t0)/1e9}%.2f s"); r
    }
    val d = "/root/testdata/sf0.1"
    println("PROBE n_embeddings " + graft.Tables.embeddings(s, d).count())
    val lsh = time("lsh_build")(Similarity.lshIndexDir(s, d))
    def nFiles(dir: String) = {
      def walk(f: java.io.File): Int =
        if (f.isFile) (if (f.getName.endsWith(".parquet")) 1 else 0)
        else Option(f.listFiles()).toSeq.flatten.map(walk).sum
      walk(new java.io.File(dir))
    }
    println("PROBE lsh_files " + nFiles(lsh))
    val ivf = time("ivf_build")(Similarity.ivfIndexDir(s, d))
    println("PROBE ivf_files " + nFiles(ivf))
    s.stop()
  }
}
