package graft.tools
object KProbe {
  def main(args: Array[String]): Unit = {
    val doc = "the quick brown fox jumps over the lazy dog " * 10 // ~450 chars
    MicroBench.time("simhash64", 50000)(id => graft.ops.TextKernels.simhash(doc + id, 5))
    MicroBench.time("winnow", 50000)(id => graft.ops.TextKernels.winnow(doc + id, 8, 4).length.toLong)
    MicroBench.time("bpe_count", 50000)(id => graft.ops.TextKernels.tokenCountBpe(doc + id).toLong)
    MicroBench.time("langid", 50000)(id => graft.ops.TextKernels.langId(doc + id).length.toLong)
  }
}
