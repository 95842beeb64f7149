package graft

import graft.core.Meas
import graft.sources.{EventsSource, TableSource}

class TableSourceSpec extends SparkSpec {

  test("csv and json round-trip the Meas set with explicit schemas") {
    val meas = EventsSource.meas(spark, sfDir).limit(200).cache()
    for (fmt <- Seq("csv", "json", "orc")) {
      val dir = tmpDir(s"graft-io-$fmt")
      // default text-format timestamp patterns are millisecond-precision;
      // Meas carries microseconds, so the format must say so explicitly
      val opts = Map("timestampFormat" -> "yyyy-MM-dd HH:mm:ss.SSSSSS") ++
        (if (fmt == "csv") Map("header" -> "true") else Map.empty)
      TableSource.write(meas, dir, fmt, options = opts)
      val back = TableSource.read(spark, dir, fmt, Some(Meas.schema), options = opts)
      assert(back.count() === 200)
      assert(back.exceptAll(meas).isEmpty && meas.exceptAll(back).isEmpty, s"$fmt round-trip must be lossless")
    }
    meas.unpersist()
  }

  test("schemaful text formats refuse to run without an explicit schema") {
    intercept[IllegalArgumentException] {
      TableSource.read(spark, "/tmp/nowhere", "csv")
    }
  }
}
