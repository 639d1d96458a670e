package graft

import graft.analytics.License

/** Pins the license-gate semantics: planted marker classes map to
  * their licenses, the bare-word decoy matches nothing, dual grants
  * resolve by restrictiveness rank, the URL-only class proves the
  * URL-shape detector is load-bearing, and the JSON bundle loader
  * rejects malformed rules loudly. */
class LicenseSpec extends SparkSpec {

  private lazy val docTags: Map[Long, (String, String, Long)] =
    License.textLicense(spark, sfDir).collect()
      .map(r => (r.getLong(0),
        (r.getString(2), r.getString(3), r.getLong(4)))).toMap

  test("planted classes map to their licenses; the decoy matches nothing") {
    docTags.foreach { case (id, (licenses, primary, n)) =>
      val cls = id % 7
      val dual = id % 17 == 0
      if (cls == 0 && !dual) {
        assert(licenses === "" && primary === "unknown" && n === 0,
          s"doc $id (decoy class ${id % 13 == 0})")
      }
      if (cls == 1 || (cls == 0 && dual))
        assert(primary === "mit", s"doc $id")
      if (cls == 4) assert(primary === "all-rights-reserved", s"doc $id")
      if (cls == 5 && !dual) assert(licenses === "apache-2.0", s"doc $id")
      // URL-only class: no phrase in the bundle names cc-by-nc — only
      // the deed-URL regex can have fired
      if (cls == 6) assert(licenses.contains("cc-by-nc-4.0"), s"doc $id")
      // dual grant: gpl (rank 3) must beat the mit mirror (rank 1)
      if (cls == 3 && dual) {
        assert(licenses.contains("gpl-3.0") && licenses.contains("mit"), s"doc $id")
        assert(primary === "gpl-3.0", s"doc $id")
      }
    }
    // every class present at this SF actually fired
    assert(docTags.values.exists(_._2 == "mit"))
    assert(docTags.values.exists(_._2 == "gpl-3.0"))
    assert(docTags.values.exists(_._2 == "cc-by-4.0"))
    assert(docTags.values.exists(_._2 == "cc-by-nc-4.0"))
    assert(docTags.values.exists(_._2 == "unknown"))
  }

  test("the mix report reconciles with the tag table") {
    val mix = License.licenseMix(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    License.textLicense(spark, sfDir).collect()
      .groupBy(r => (r.getString(1), r.getString(3)))
      .foreach { case (k, rows) => assert(mix(k) === rows.length.toLong, k) }
    // shares are exact integer ppm summing to ≤ 1e6 per source
    License.licenseMix(spark, sfDir).collect()
      .groupBy(_.getString(0)).foreach { case (src, rows) =>
        val s = rows.map(_.getLong(3)).sum
        assert(s <= 1000000L && s > 1000000L - rows.length, src)
      }
  }

  test("the bundle loader rejects malformed rules loudly") {
    intercept[IllegalArgumentException](License.parseRules("""{"rules": []}"""))
    intercept[IllegalArgumentException](License.parseRules(
      """{"rules": [{"license": "x", "rank": 1, "phrases": [], "urls": []}]}"""))
    intercept[IllegalArgumentException](License.parseRules(
      """{"rules": [{"license": "x", "rank": 1, "phrases": ["p"],
        "urls": [], "extra": 1}]}"""))
    assert(License.rules.size === 6)
  }
}
