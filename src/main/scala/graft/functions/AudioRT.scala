package graft.functions

import java.io.ByteArrayInputStream

import javax.sound.sampled.AudioSystem

/**
 * REAL audio kernels over the JDK's built-in `javax.sound.sampled` codecs
 * (WAV/AU/AIFF PCM). Same contract as [[ImageRT]]: null on undecodable
 * bytes — a web-crawled media corpus must never kill a job on one
 * truncated file. Video remains the only stubbed modality (no JDK codec).
 */
object AudioRT {

  /** Header parse: (sampleRateHz, channels, frames) or null. */
  def audioMeta(bytes: Array[Byte]): org.apache.spark.sql.catalyst.InternalRow = {
    if (bytes == null || bytes.length == 0) return null
    try {
      val in = AudioSystem.getAudioInputStream(new ByteArrayInputStream(bytes))
      try {
        val f = in.getFormat
        new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(Array[Any](
          f.getSampleRate.toInt, f.getChannels, in.getFrameLength))
      } finally in.close()
    } catch { case _: Throwable => null }
  }

  /**
   * RMS energy envelope over `bins` equal time windows of the decoded PCM
   * signal (first channel, 8/16-bit integer PCM) — a genuine audio
   * feature for dedup/quality filtering. Values scaled to 0..10000
   * (fixed-point, deterministic across JVMs). Null if undecodable.
   */
  def rmsEnvelope(bytes: Array[Byte], bins: Int): Array[Long] = {
    if (bytes == null || bytes.length == 0) return null
    try {
      val in = AudioSystem.getAudioInputStream(new ByteArrayInputStream(bytes))
      try {
        val f = in.getFormat
        // only linear PCM: mu-law/a-law AU files also report 8-bit sample
        // size but need companding tables — decode them as null, not noise
        val enc = f.getEncoding
        val signed = enc == javax.sound.sampled.AudioFormat.Encoding.PCM_SIGNED
        if (!signed && enc != javax.sound.sampled.AudioFormat.Encoding.PCM_UNSIGNED) return null
        val bytesPerSample = f.getSampleSizeInBits / 8
        if (bytesPerSample < 1 || bytesPerSample > 2) return null
        if (bytesPerSample == 2 && !signed) return null // 16-bit unsigned: not PCM we handle
        val data = in.readAllBytes()
        val frameSize = f.getFrameSize
        val n = data.length / frameSize
        if (n == 0) return null
        val sums = new Array[Double](bins)
        val counts = new Array[Long](bins)
        var i = 0
        while (i < n) {
          val off = i * frameSize // first channel only
          val sample =
            // 8-bit WAV is unsigned; 8-bit AU/AIFF is SIGNED — honor the
            // format's encoding instead of assuming one convention
            if (bytesPerSample == 1) {
              if (signed) data(off).toDouble else (data(off) & 0xff) - 128.0
            }
            else {
              val lo = data(off) & 0xff
              val hi = data(off + 1)
              val v = if (f.isBigEndian) (data(off) << 8) | (data(off + 1) & 0xff)
                      else (hi << 8) | lo
              v / 256.0
            }
          val b = math.min(bins - 1, (i.toLong * bins / n).toInt)
          sums(b) += sample * sample
          counts(b) += 1
          i += 1
        }
        Array.tabulate(bins)(b =>
          if (counts(b) == 0) 0L
          else math.round(math.sqrt(sums(b) / counts(b)) / 128.0 * 10000.0))
      } finally in.close()
    } catch { case _: Throwable => null }
  }
}
