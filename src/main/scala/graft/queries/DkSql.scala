package graft.queries

/** The ONE DuckDB-mirror derivation of the engine's md5-60 hash
  * (TextFunctions.hash64 / the compiled Md5Hash60 / Sampling.seededHash)
  * and of the xor-permutation mix constants (the MinHash family's
  * mixConstant) — shared by every query module so a parity fix reaches
  * every oracle at once. Text, Vector and Pipeline each carried a
  * private copy that stayed identical only by care; the codebase's own
  * design rule ("ONE chain shared ... so the two can never drift")
  * applies to the mirror side too. */
private[queries] object DkSql {

  /** DuckDB mirror of TextFunctions.hash64 / Md5Hash60. */
  def dkHash(v: String, seed: Int): String =
    s"CAST(('0x'||substr(md5($v||':$seed'),1,15)) AS BIGINT)"

  /** DuckDB mirror of the mix-constant family. */
  def dkMix(i: Int): String =
    s"CAST(('0x'||substr(md5('mix:$i'),1,15)) AS BIGINT)"
}
