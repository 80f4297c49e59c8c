package graft.sinks

import org.scalacheck.{Gen, Prop, Properties}

/** The Amplitude batcher must partition losslessly under its caps. */
object BatcherProperties extends Properties("graft.batcher") {

  private val genEvents: Gen[List[String]] =
    Gen.listOf(Gen.chooseNum(1, 50).flatMap(n => Gen.listOfN(n, Gen.alphaChar).map(_.mkString)))

  private val genBatcher: Gen[AmplitudeHttpSink.Batcher] = for {
    maxBytes <- Gen.chooseNum(20, 500)
    maxEvents <- Gen.chooseNum(1, 10)
  } yield AmplitudeHttpSink.Batcher(maxBytes, maxEvents)

  property("concatenated batches reproduce the input exactly") =
    Prop.forAll(genEvents, genBatcher) { (events, batcher) =>
      batcher(events.iterator).flatten.toList == events
    }

  property("no batch exceeds the event-count cap") =
    Prop.forAll(genEvents, genBatcher) { (events, batcher) =>
      batcher(events.iterator).forall(_.length <= batcher.maxEventsPerBatch)
    }

  property("no multi-event batch exceeds the byte cap") =
    Prop.forAll(genEvents, genBatcher) { (events, batcher) =>
      batcher(events.iterator).forall { batch =>
        batch.length <= 1 || batch.map(2 * _.length).sum <= batcher.maxBytesPerBatch
      }
    }
}
