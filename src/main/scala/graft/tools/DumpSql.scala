// dev tool: dump generated oracle SQL for offline validation
object DumpSql {
  def main(args: Array[String]): Unit = {
    def w(p: String, s: String): Unit = {
      val pw = new java.io.PrintWriter(p); pw.write(s); pw.close()
    }
    w("/tmp/knn_lsh_oracle.sql", graft.operators.Similarity.knnLshSql)
    w("/tmp/knn_ivf_oracle.sql", graft.operators.Similarity.knnIvfSql)
    w("/tmp/mm_features_oracle.sql", graft.operators.Multimodal.mmFeaturesSql)
    w("/tmp/dedup_minhash_oracle.sql", graft.operators.Dedup.dedupMinhashSql)
    w("/tmp/dedup_simhash_oracle.sql", graft.operators.Dedup.dedupSimhashSql)
  }
}
