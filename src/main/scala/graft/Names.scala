package graft

/** Close-out aid: prints every registered query name, one per line.
  * `tools/closeout.py` diffs this listing against the committed
  * full-registry sweep files (CHECK_SF*_r{N}.txt) so a query registered
  * AFTER the sweep ran fails the round close loudly instead of shipping
  * unexercised (the round-14 process foul: `d_corpus_mix_tokens` landed
  * in the snapshot commit with no postdating sweep line and was broken
  * on both gates). No SparkSession is needed — the registry is a map of
  * lambdas, and constructing it must stay side-effect-free.
  */
object Names {
  def main(args: Array[String]): Unit =
    SparkEntry.queries.keys.toSeq.sorted.foreach(println)
}
