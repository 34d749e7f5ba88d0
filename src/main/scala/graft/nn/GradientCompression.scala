package graft.nn

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import breeze.linalg.DenseMatrix
import graft.nn.Tensors.Tensors

/** Top-k gradient sparsification with error feedback — the standard
  * bandwidth lever for parameter-server training (Deep Gradient
  * Compression family): each push sends only the k
  * largest-magnitude gradient entries; everything unsent accumulates in
  * a worker-local RESIDUAL added to the next step's gradient, so
  * information is delayed, never lost, and convergence is preserved.
  *
  * At cluster scale this attacks the training design ceiling named in
  * the round-1 audit: the driver-hosted server serializes whole weight
  * tensors per update (O(model) per push × partitions), saturating the
  * driver NIC first. A k of ~1% of entries cuts push bytes ~50×
  * (4-byte index + 8-byte value per entry vs 8 bytes × all entries).
  *
  * Wire format is self-describing (magic header), so the server accepts
  * dense and sparse pushes interchangeably ([[decodeMaybeSparse]]) and
  * mixed fleets work during rollout.
  */
object GradientCompression {
  /** Magic first-int of a sparse wire payload. Dense [[Tensors.toBytes]]
    * starts with the tensor count (always ≥ 0), so negative ⇒ sparse. */
  private val Magic = -2
  /** Magic for the int8-quantized sparse form (5 bytes/entry vs 12). */
  private val MagicQ8 = -3

  /** One sparse gradient set: per tensor, shape + column-major linear
    * indices + values of the kept entries. */
  case class SparseGrad(rows: Array[Int], cols: Array[Int],
      idx: Array[Array[Int]], vals: Array[Array[Double]]) {
    def nnz: Int = idx.iterator.map(_.length).sum
    def toDense: Tensors =
      Array.tabulate(rows.length) { t =>
        val m = DenseMatrix.zeros[Double](rows(t), cols(t))
        var i = 0
        while (i < idx(t).length) { m.data(idx(t)(i)) = vals(t)(i); i += 1 }
        m
      }
  }

  /** Sparsify `grad + residual` to its k largest-magnitude entries;
    * `residual` is UPDATED IN PLACE to hold everything not sent (kept
    * entries zero out). Deterministic under ties: earlier tensors /
    * lower linear indices win the remaining budget. */
  def sparsifyTopK(grad: Tensors, residual: Tensors, k: Int): SparseGrad = {
    require(grad.length == residual.length, "grad/residual shape mismatch")
    val acc: Tensors = Array.tabulate(grad.length)(i => grad(i) + residual(i))
    // drop non-finite entries OUTRIGHT (hogwild races can produce NaN —
    // see the centered-rmsprop fix): a NaN magnitude would poison the
    // sort threshold (every comparison false ⇒ nothing ever sent again)
    // and, parked in the residual, it would stay NaN forever. Zeroing
    // is the only recoverable choice.
    acc.foreach { m => val d = m.data; var i = 0
      while (i < d.length) { if (!java.lang.Double.isFinite(d(i))) d(i) = 0.0; i += 1 } }
    val total = acc.iterator.map(_.size).sum
    val kk = math.min(k, total)
    if (kk <= 0) {
      // nothing sent, but the contract stands: the whole accumulated
      // gradient parks in the residual for a later push
      var t = 0
      while (t < acc.length) {
        System.arraycopy(acc(t).data, 0, residual(t).data, 0, acc(t).data.length); t += 1
      }
      return SparseGrad(grad.map(_.rows), grad.map(_.cols),
        grad.map(_ => Array.empty[Int]), grad.map(_ => Array.empty[Double]))
    }
    // threshold = kk-th largest |value| over ALL entries (global top-k,
    // not per-tensor: biases and hot layers compete fairly)
    val mags = new Array[Double](total)
    var p = 0
    acc.foreach { m => val d = m.data; var i = 0
      while (i < d.length) { mags(p) = math.abs(d(i)); p += 1; i += 1 } }
    java.util.Arrays.sort(mags)
    val thr = mags(total - kk)
    val strictOver = {
      // entries strictly above thr always go; ties at thr share the rest
      var c = 0; var i = total - 1
      while (i >= 0 && mags(i) > thr) { c += 1; i -= 1 }
      c
    }
    var tieBudget = kk - strictOver
    val idx = Array.ofDim[Array[Int]](acc.length)
    val vals = Array.ofDim[Array[Double]](acc.length)
    var t = 0
    while (t < acc.length) {
      val d = acc(t).data
      val ib = Array.newBuilder[Int]; val vb = Array.newBuilder[Double]
      var i = 0
      while (i < d.length) {
        val a = math.abs(d(i))
        val take = a > thr || (a == thr && tieBudget > 0 && { tieBudget -= 1; true })
        if (take) { ib += i; vb += d(i); residual(t).data(i) = 0.0 }
        else residual(t).data(i) = d(i)
        i += 1
      }
      idx(t) = ib.result(); vals(t) = vb.result()
      t += 1
    }
    SparseGrad(grad.map(_.rows), grad.map(_.cols), idx, vals)
  }

  def toBytes(s: SparseGrad): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(Magic)
    out.writeInt(s.rows.length)
    var t = 0
    while (t < s.rows.length) {
      out.writeInt(s.rows(t)); out.writeInt(s.cols(t)); out.writeInt(s.idx(t).length)
      s.idx(t).foreach(out.writeInt)
      s.vals(t).foreach(out.writeDouble)
      t += 1
    }
    out.flush()
    bos.toByteArray
  }

  def fromBytes(bytes: Array[Byte]): SparseGrad = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    require(in.readInt() == Magic, "not a sparse gradient payload")
    val n = in.readInt()
    val rows = new Array[Int](n); val cols = new Array[Int](n)
    val idx = new Array[Array[Int]](n); val vals = new Array[Array[Double]](n)
    var t = 0
    while (t < n) {
      rows(t) = in.readInt(); cols(t) = in.readInt()
      val nnz = in.readInt()
      idx(t) = Array.fill(nnz)(in.readInt())
      vals(t) = Array.fill(nnz)(in.readDouble())
      t += 1
    }
    SparseGrad(rows, cols, idx, vals)
  }

  /** Int8-quantize a sparse gradient's VALUES (symmetric per-tensor
    * scale = max|v|/127) and charge the rounding error back to the
    * residual — composing with top-k's error feedback, so quantization
    * error is also delayed, never lost. Wire cost per entry drops from
    * 12 bytes (int index + double) to 5 (int index + signed byte);
    * with top-k at 1% density the two stages together cut push bytes
    * ~160× vs dense. */
  def quantizeSparse(s: SparseGrad, residual: Tensors): QuantizedSparseGrad = {
    val scales = new Array[Double](s.rows.length)
    val codes = Array.ofDim[Array[Byte]](s.rows.length)
    var t = 0
    while (t < s.rows.length) {
      var maxAbs = 0.0
      s.vals(t).foreach(v => maxAbs = math.max(maxAbs, math.abs(v)))
      val scale = if (maxAbs == 0.0) 1.0 else maxAbs / 127.0
      scales(t) = scale
      codes(t) = new Array[Byte](s.vals(t).length)
      var i = 0
      while (i < s.vals(t).length) {
        val q = math.round(s.vals(t)(i) / scale).toInt.max(-127).min(127)
        codes(t)(i) = q.toByte
        // rounding error joins the residual at this entry's position
        residual(t).data(s.idx(t)(i)) += s.vals(t)(i) - q * scale
        i += 1
      }
      t += 1
    }
    QuantizedSparseGrad(s.rows, s.cols, s.idx, scales, codes)
  }

  case class QuantizedSparseGrad(rows: Array[Int], cols: Array[Int],
      idx: Array[Array[Int]], scales: Array[Double], codes: Array[Array[Byte]]) {
    def toDense: Tensors =
      Array.tabulate(rows.length) { t =>
        val m = DenseMatrix.zeros[Double](rows(t), cols(t))
        var i = 0
        while (i < idx(t).length) { m.data(idx(t)(i)) = codes(t)(i) * scales(t); i += 1 }
        m
      }
  }

  def toBytesQ8(s: QuantizedSparseGrad): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(MagicQ8)
    out.writeInt(s.rows.length)
    var t = 0
    while (t < s.rows.length) {
      out.writeInt(s.rows(t)); out.writeInt(s.cols(t)); out.writeInt(s.idx(t).length)
      out.writeDouble(s.scales(t))
      s.idx(t).foreach(out.writeInt)
      out.write(s.codes(t))
      t += 1
    }
    out.flush()
    bos.toByteArray
  }

  def fromBytesQ8(bytes: Array[Byte]): QuantizedSparseGrad = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    require(in.readInt() == MagicQ8, "not a q8 sparse payload")
    val n = in.readInt()
    val rows = new Array[Int](n); val cols = new Array[Int](n)
    val idx = new Array[Array[Int]](n); val scales = new Array[Double](n)
    val codes = new Array[Array[Byte]](n)
    var t = 0
    while (t < n) {
      rows(t) = in.readInt(); cols(t) = in.readInt()
      val nnz = in.readInt()
      scales(t) = in.readDouble()
      idx(t) = Array.fill(nnz)(in.readInt())
      codes(t) = new Array[Byte](nnz); in.readFully(codes(t))
      t += 1
    }
    QuantizedSparseGrad(rows, cols, idx, scales, codes)
  }

  /** Server-side decode of any wire form: sparse and quantized-sparse
    * payloads (magic headers) densify, anything else is the plain dense
    * codec. */
  def decodeMaybeSparse(bytes: Array[Byte]): Tensors = {
    val head = if (bytes.length >= 4)
      (bytes(0) & 0xFF) << 24 | (bytes(1) & 0xFF) << 16 |
        (bytes(2) & 0xFF) << 8 | (bytes(3) & 0xFF)
    else 0
    if (head == Magic) fromBytes(bytes).toDense
    else if (head == MagicQ8) fromBytesQ8(bytes).toDense
    else Tensors.fromBytes(bytes)
  }
}
