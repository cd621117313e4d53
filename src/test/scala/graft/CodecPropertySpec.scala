package graft

import org.scalacheck.Gen
import org.scalacheck.Prop.forAll
import org.scalacheck.Test.{check, Parameters}
import org.scalatest.funsuite.AnyFunSuite

import graft.ext.Multimodal.{AudioCodec, ImageCodec, VideoCodec}

/** Property tests for the three pure-JDK media codecs: encode→decode is an
  * identity on the planted structural fields for the WHOLE valid parameter
  * space, not just the handful of fixture points the gates use. ScalaCheck
  * drives the generators; failures shrink to a minimal counterexample.
  */
class CodecPropertySpec extends AnyFunSuite {

  private val params = Parameters.default.withMinSuccessfulTests(60)

  private def assertHolds(name: String, prop: org.scalacheck.Prop): Unit = {
    val res = check(params, prop)
    assert(res.passed, s"$name: $res")
  }

  test("AVI container round-trips arbitrary frame payloads byte-identically") {
    // buildAvi stores payloads verbatim — decode must return them
    // bit-exactly regardless of content (including empty and odd-length
    // payloads, which exercise RIFF even-padding)
    val genFrames = Gen.listOfN(5, Gen.choose(0, 64).flatMap(n => Gen.listOfN(n, Gen.choose(Byte.MinValue, Byte.MaxValue)).map(_.toArray)))
    assertHolds("avi-roundtrip", forAll(
      Gen.choose(1, 640), Gen.choose(1, 480), Gen.choose(1, 60), genFrames
    ) { (w, h, fps, frames) =>
      val avi = VideoCodec.buildAvi(w, h, fps, frames)
      VideoCodec.decodeAvi(avi).exists { a =>
        a.width == w && a.height == h && a.fps == fps &&
          a.frames.size == frames.size &&
          a.frames.zip(frames).forall { case (x, y) => x.sameElements(y) }
      }
    })
  }

  test("synthetic AVI decodes to planted dims and every frame JPEG-parses") {
    assertHolds("avi-synthetic", forAll(
      Gen.choose(0L, 1000000L), Gen.choose(8, 80), Gen.choose(8, 80),
      Gen.choose(1, 6), Gen.choose(1, 30)
    ) { (id, w, h, nf, fps) =>
      VideoCodec.decodeAvi(VideoCodec.syntheticAvi(id, w, h, nf, fps)).exists { a =>
        a.width == w && a.height == h && a.fps == fps && a.frames.size == nf &&
          a.frames.forall(f => ImageCodec.decodeImage(f).exists {
            case (fw, fh, _, _) => fw == w && fh == h
          })
      }
    })
  }

  test("PNG encode→decode recovers dims and colorspace over the dim space") {
    assertHolds("png-roundtrip", forAll(
      Gen.choose(0L, 1000000L), Gen.choose(1, 200), Gen.choose(1, 200), Gen.oneOf(true, false)
    ) { (id, w, h, gray) =>
      ImageCodec.decodeImage(ImageCodec.syntheticPng(id, w, h, gray)).exists {
        case (dw, dh, ch, hist) =>
          dw == w && dh == h && ch == (if (gray) 1 else 3) &&
            math.abs(hist.sum - 1.0f) < 1e-3
      }
    })
  }

  test("WAV encode→decode recovers format fields over the parameter space") {
    assertHolds("wav-roundtrip", forAll(
      Gen.choose(0L, 1000000L), Gen.choose(4000, 96000), Gen.choose(1, 4), Gen.choose(1, 4000)
    ) { (id, rate, channels, frames) =>
      AudioCodec.decodeWav(AudioCodec.syntheticWav(id, rate, channels, frames)).exists {
        case (r, c, f, rms) => r == rate && c == channels && f == frames.toLong && rms.length == 8
      }
    })
  }

  test("image resize never upscales and preserves aspect-fit bounds") {
    assertHolds("resize-bounds", forAll(
      Gen.choose(0L, 100000L), Gen.choose(1, 150), Gen.choose(1, 150),
      Gen.choose(1, 100), Gen.choose(1, 100)
    ) { (id, w, h, tw, th) =>
      val png = ImageCodec.syntheticPng(id, w, h, gray = false)
      ImageCodec.resizeImage(png, tw, th).exists { resized =>
        ImageCodec.decodeImage(resized).exists { case (rw, rh, _, _) =>
          rw <= math.max(1, math.min(w, tw)) &&
            rh <= math.max(1, math.min(h, th)) &&
            rw <= w && rh <= h // never upscales
        }
      }
    })
  }
}
