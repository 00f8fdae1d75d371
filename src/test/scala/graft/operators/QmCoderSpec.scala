package graft.operators

import org.scalatest.funsuite.AnyFunSuite

/** The QM arithmetic coder in isolation: encoder and decoder must be
  * exact inverses over adversarial decision streams — skewed, alternating,
  * multi-context, fixed-state, and fully random mixes — because a single
  * mis-ordered renormalization or exchange branch corrupts every decision
  * that follows. Structural checks pin the Table D.3 transcription. */
class QmCoderSpec extends AnyFunSuite {

  test("Table D.3 structural invariants") {
    assert(QmCoder.Qe.length == 114)
    assert(QmCoder.NextLps.length == 114 && QmCoder.NextMps.length == 114 &&
      QmCoder.SwitchMps.length == 114)
    // every Qe is a valid probability (< 0x8000), transitions in range
    QmCoder.Qe.foreach(q => assert(q > 0 && q < 0x8000))
    QmCoder.NextLps.foreach(i => assert(i >= 0 && i <= 113))
    QmCoder.NextMps.foreach(i => assert(i >= 0 && i <= 113))
    // switch happens only at the Qe ≈ 0.5 states (start of each chain)
    QmCoder.SwitchMps.zipWithIndex.foreach { case (s, i) =>
      if (s == 1) assert(QmCoder.Qe(i) > 0x5000, s"switch at state $i")
    }
    // the fixed state self-loops and never switches
    assert(QmCoder.NextMps(113) == 113 && QmCoder.NextLps(113) == 113 &&
      QmCoder.SwitchMps(113) == 0)
    // MPS chains from state 0 are acyclic until a Qe ≈ 0.5 state: walking
    // NextMps from 0 must terminate at a self-loop within 113 steps
    var i = 0
    var steps = 0
    while (QmCoder.NextMps(i) != i && steps < 200) { i = QmCoder.NextMps(i); steps += 1 }
    assert(steps < 200, "NextMps walk did not reach a terminal state")
  }

  private def roundTrip(decisions: Seq[(Int, Int)], nCtx: Int): Unit = {
    // encode
    val out = new java.io.ByteArrayOutputStream()
    val enc = new QmCoder.Encoder(out)
    val es = new QmCoder.Stats(nCtx)
    decisions.foreach { case (cx, d) =>
      if (cx < 0) enc.encodeFixed(d) else enc.encode(es, cx, d)
    }
    enc.finish()
    val bytes = out.toByteArray
    // the stream must be marker-safe: no 0xFF without a stuffed 0x00
    bytes.indices.dropRight(1).foreach { i =>
      if ((bytes(i) & 0xff) == 0xff)
        assert((bytes(i + 1) & 0xff) == 0x00, s"naked FF at $i")
    }
    // decode
    val dec = new QmCoder.Decoder(bytes, 0, bytes.length)
    val ds = new QmCoder.Stats(nCtx)
    decisions.zipWithIndex.foreach { case ((cx, d), i) =>
      val got = if (cx < 0) dec.decodeFixed() else dec.decode(ds, cx)
      assert(got == d, s"decision $i (ctx $cx): wanted $d got $got")
    }
  }

  test("round-trip: heavily skewed single-context stream") {
    roundTrip((0 until 5000).map(i => (0, if (i % 97 == 0) 1 else 0)), 1)
  }

  test("round-trip: alternating and block-alternating streams") {
    roundTrip((0 until 2000).map(i => (0, i % 2)), 1)
    roundTrip((0 until 2000).map(i => (0, (i / 13) % 2)), 1)
  }

  test("round-trip: multi-context with divergent statistics") {
    // ctx 0 mostly 0s, ctx 1 mostly 1s, ctx 2 random-ish — interleaved,
    // so context-state bookkeeping errors cross-contaminate visibly
    val rnd = new scala.util.Random(42)
    val decisions = (0 until 9000).map { i =>
      val cx = i % 3
      val d = cx match {
        case 0 => if (rnd.nextInt(20) == 0) 1 else 0
        case 1 => if (rnd.nextInt(20) == 0) 0 else 1
        case _ => rnd.nextInt(2)
      }
      (cx, d)
    }
    roundTrip(decisions, 3)
  }

  test("round-trip: fixed-state decisions interleaved with adaptive ones") {
    val rnd = new scala.util.Random(7)
    roundTrip((0 until 6000).map { i =>
      if (i % 5 == 4) (-1, rnd.nextInt(2)) // fixed (sign-style) decision
      else (rnd.nextInt(4), if (rnd.nextInt(10) < 8) 0 else 1)
    }, 4)
  }

  test("round-trip: fully random, many seeds (carry/stuffing paths)") {
    // random streams drive the carry-resolution and FF-stuffing paths;
    // 20 seeds × 3000 decisions makes a missed stacked-FF carry
    // essentially certain to surface
    (1 to 20).foreach { seed =>
      val rnd = new scala.util.Random(seed)
      roundTrip((0 until 3000).map(_ => (rnd.nextInt(2), rnd.nextInt(2))), 2)
    }
  }

  test("adaptation compresses: skewed stream beats 1 bit per decision") {
    val out = new java.io.ByteArrayOutputStream()
    val enc = new QmCoder.Encoder(out)
    val s = new QmCoder.Stats(1)
    val n = 8000
    (0 until n).foreach(i => enc.encode(s, 0, if (i % 50 == 0) 1 else 0))
    enc.finish()
    // ~2% LPS rate → well under n/8 bytes if estimation adapts
    assert(out.size() < n / 8 / 4,
      s"no adaptation: ${out.size()} bytes for $n skewed decisions")
  }

  test("decoder zero-fills past a marker instead of reading into it") {
    val out = new java.io.ByteArrayOutputStream()
    val enc = new QmCoder.Encoder(out)
    val s = new QmCoder.Stats(1)
    (0 until 100).foreach(i => enc.encode(s, 0, i % 2))
    enc.finish()
    // append a marker; decoding MORE decisions than were coded must not
    // throw or read past it (garbage values are fine — deterministic)
    out.write(0xff); out.write(0xd9)
    val bytes = out.toByteArray
    val dec = new QmCoder.Decoder(bytes, 0, bytes.length)
    val ds = new QmCoder.Stats(1)
    (0 until 100).foreach(i => assert(dec.decode(ds, 0) == i % 2))
    (0 until 500).foreach(_ => dec.decode(ds, 0)) // zero-fill territory
  }
}
