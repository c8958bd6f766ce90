package graft.table

import com.fasterxml.jackson.databind.ObjectMapper
import com.fasterxml.jackson.databind.node.{ArrayNode, ObjectNode}

/** Driver-side JSON codec for the store's metadata artifacts (manifests,
  * table meta, histogram / Bloom / index sidecars).
  *
  * Why JSON files instead of parquet datasets: a manifest is a few hundred
  * rows of driver-resident metadata, but writing it through Spark costs a
  * full job (write) plus another per read — and commits run once per
  * micro-batch under streaming ingestion, so those fixed per-job costs
  * dominated the storage-path wall time (round-3 verdict: q34 21.5 s was
  * per-commit overhead, not data). Real Iceberg makes the same call: its
  * manifests/manifest-lists are driver-readable avro/JSON, never a Spark
  * job. Jackson ships with Spark itself, so no new dependency.
  *
  * Doubles round-trip exactly (jackson emits shortest-repr decimal;
  * `±Double.MaxValue` — the fail-open stats sentinel — included). NaN never
  * reaches these files: manifest stats fail open to the full range instead.
  */
/** One shard row of a two-level manifest LIST: where the shard file is,
  * how many data entries it holds, and the union bounds (curve-key and
  * lat/lon) of those entries — everything a planner needs to decide
  * whether to download the shard at all. `lineages` is the distinct
  * lineage-id summary of the shard's entries (usually ONE — a shard is
  * written by a single commit), letting the streaming-ingest idempotence
  * check ([[graft.table.SnapshotStore.committedLineage]]) read the root
  * alone instead of parsing every shard per micro-batch; `None` means a
  * root written before the field existed — unknown, never assumed empty
  * (the reader falls back to a full parse). */
final case class ShardMeta(path: String, entries: Int,
                           minZ: Long, maxZ: Long,
                           minLat: Double, maxLat: Double,
                           minLon: Double, maxLon: Double,
                           lineages: Option[Seq[String]] = None)

object MetaJson {

  private val mapper = new ObjectMapper()

  private def entryNode(e: FileEntry): ObjectNode = {
    val o = mapper.createObjectNode()
    o.put("path", e.path); o.put("rows", e.rows)
    o.put("minZ", e.minZ); o.put("maxZ", e.maxZ)
    o.put("minLat", e.minLat); o.put("maxLat", e.maxLat)
    o.put("minLon", e.minLon); o.put("maxLon", e.maxLon)
    o.put("lineageId", e.lineageId); o.put("wallMs", e.wallMs)
    o.put("kind", e.kind); o.put("seq", e.seq)
    o
  }

  def manifestJson(entries: Seq[FileEntry]): String = {
    val root = mapper.createObjectNode()
    val arr = root.putArray("entries")
    entries.foreach(e => arr.add(entryNode(e)))
    mapper.writerWithDefaultPrettyPrinter().writeValueAsString(root)
  }

  /** Additive schema evolution: every field except the identity pair
    * (path, rows) reads through a default, so manifests written BEFORE a
    * field existed still parse after it's added — the same contract the
    * legacy parquet manifest path gives kind/seq. Geometric stats default
    * to the fail-open full range (a pruner may only skip a file it can
    * PROVE disjoint; unknown stats must never skip). */
  def parseManifest(json: String): Seq[FileEntry] =
    entriesFrom(mapper.readTree(json))

  private def entriesFrom(root: com.fasterxml.jackson.databind.JsonNode): Seq[FileEntry] = {
    val arr = root.get("entries").asInstanceOf[ArrayNode]
    def l(o: com.fasterxml.jackson.databind.JsonNode, n: String, d: Long) =
      Option(o.get(n)).map(_.asLong()).getOrElse(d)
    def d(o: com.fasterxml.jackson.databind.JsonNode, n: String, dv: Double) =
      Option(o.get(n)).map(_.asDouble()).getOrElse(dv)
    def s(o: com.fasterxml.jackson.databind.JsonNode, n: String, dv: String) =
      Option(o.get(n)).map(_.asText()).getOrElse(dv)
    (0 until arr.size()).map { i =>
      val o = arr.get(i)
      FileEntry(o.get("path").asText(), o.get("rows").asLong(),
        l(o, "minZ", Long.MinValue), l(o, "maxZ", Long.MaxValue),
        d(o, "minLat", -Double.MaxValue), d(o, "maxLat", Double.MaxValue),
        d(o, "minLon", -Double.MaxValue), d(o, "maxLon", Double.MaxValue),
        s(o, "lineageId", ""), l(o, "wallMs", 0L),
        s(o, "kind", "data"), l(o, "seq", 0L))
    }
  }

  /** Two-level manifest LIST (the Iceberg shape at the 10⁶-file design
    * point): `shards` rows point at per-shard manifest files with union
    * Z / lat-lon bounds so a box read downloads only overlapping shards;
    * `entries` holds the few non-data rows INLINE (delete tombstone
    * manifests + lineage markers), which every plan needs regardless of
    * the box. A flat manifest is the same document with no `shards`
    * node — one parser reads both. */
  def manifestListJson(shards: Seq[ShardMeta], inline: Seq[FileEntry]): String = {
    val root = mapper.createObjectNode()
    val sArr = root.putArray("shards")
    shards.foreach { sm =>
      val o = sArr.addObject()
      o.put("path", sm.path); o.put("entries", sm.entries)
      o.put("minZ", sm.minZ); o.put("maxZ", sm.maxZ)
      o.put("minLat", sm.minLat); o.put("maxLat", sm.maxLat)
      o.put("minLon", sm.minLon); o.put("maxLon", sm.maxLon)
      sm.lineages.foreach { ls =>
        val la = o.putArray("lineages"); ls.foreach(la.add)
      }
    }
    val eArr = root.putArray("entries")
    inline.foreach(e => eArr.add(entryNode(e)))
    mapper.writerWithDefaultPrettyPrinter().writeValueAsString(root)
  }

  /** Parse either manifest form: (shards, inline entries). Flat manifests
    * come back as (empty, all entries). Shard bounds read through the
    * same fail-open defaults as entry stats — an unknown bound makes the
    * shard un-prunable, never silently skipped. */
  def parseManifestRoot(json: String): (Seq[ShardMeta], Seq[FileEntry]) = {
    // ONE readTree for both halves — a second parse of the same document
    // doubled driver-side cost on every snapshot read (flat manifests can
    // be MBs before the sharding threshold, and legacy tables stay flat)
    val root = mapper.readTree(json)
    val entries = entriesFrom(root)
    val shardsNode = Option(root.get("shards")).map(_.asInstanceOf[ArrayNode])
    val shards = shardsNode.map { arr =>
      def l(o: com.fasterxml.jackson.databind.JsonNode, n: String, d: Long) =
        Option(o.get(n)).map(_.asLong()).getOrElse(d)
      def d(o: com.fasterxml.jackson.databind.JsonNode, n: String, dv: Double) =
        Option(o.get(n)).map(_.asDouble()).getOrElse(dv)
      (0 until arr.size()).map { i =>
        val o = arr.get(i)
        // absent lineages node stays None (pre-field roots: UNKNOWN, the
        // reader must full-parse) — never defaulted to the empty list,
        // which would silently claim "no lineages in this shard"
        val lin = Option(o.get("lineages")).map { ln =>
          val a = ln.asInstanceOf[ArrayNode]
          (0 until a.size()).map(j => a.get(j).asText())
        }
        ShardMeta(o.get("path").asText(), o.get("entries").asInt(),
          l(o, "minZ", Long.MinValue), l(o, "maxZ", Long.MaxValue),
          d(o, "minLat", -Double.MaxValue), d(o, "maxLat", Double.MaxValue),
          d(o, "minLon", -Double.MaxValue), d(o, "maxLon", Double.MaxValue),
          lin)
      }
    }.getOrElse(Seq.empty)
    (shards, entries)
  }

  def tableMetaJson(curve: String, zRes: Int, histRes: Int): String = {
    val o = mapper.createObjectNode()
    o.put("curve", curve); o.put("zRes", zRes); o.put("histRes", histRes)
    mapper.writerWithDefaultPrettyPrinter().writeValueAsString(o)
  }

  /** (curve, zRes, histRes). */
  def parseTableMeta(json: String): (String, Int, Int) = {
    val o = mapper.readTree(json)
    (o.get("curve").asText(), o.get("zRes").asInt(), o.get("histRes").asInt())
  }

  // hist/index sidecars carry up to 4^histRes rows per unit — the ONE
  // metadata payload where codec speed matters (every append serializes
  // them, every fromStore/hotCells parses them). These four codecs use
  // jackson's STREAMING generator/parser instead of the tree model (no
  // per-value node allocation); the document format is unchanged and the
  // tree-model parsers above still read the same files.

  def histJson(cells: Seq[(Long, Long)]): String = {
    val sw = new java.io.StringWriter(cells.size * 16 + 32)
    val g = mapper.getFactory.createGenerator(sw)
    g.writeStartObject()
    g.writeArrayFieldStart("cells")
    cells.foreach { case (c, n) =>
      g.writeStartArray(); g.writeNumber(c); g.writeNumber(n); g.writeEndArray()
    }
    g.writeEndArray()
    g.writeEndObject()
    g.close()
    sw.toString
  }

  def parseHist(json: String): Seq[(Long, Long)] = {
    import com.fasterxml.jackson.core.JsonToken
    val p = mapper.getFactory.createParser(json)
    val out = Seq.newBuilder[(Long, Long)]
    try {
      // {"cells": [[c,n], ...]} — walk tokens, no tree
      while (p.nextToken() != null && p.currentToken() != JsonToken.START_ARRAY) ()
      var t = p.nextToken()
      while (t == JsonToken.START_ARRAY) {
        p.nextToken(); val c = p.getLongValue
        p.nextToken(); val n = p.getLongValue
        p.nextToken() // END_ARRAY of the row
        out += ((c, n))
        t = p.nextToken()
      }
    } finally p.close()
    out.result()
  }

  def bloomJson(keyCol: String, k: Int, files: Seq[(String, Array[Long])]): String = {
    val sw = new java.io.StringWriter(files.map(_._2.length).sum * 12 + 256)
    val g = mapper.getFactory.createGenerator(sw)
    g.writeStartObject()
    g.writeStringField("keyCol", keyCol)
    g.writeNumberField("k", k)
    g.writeArrayFieldStart("files")
    files.foreach { case (p, bits) =>
      g.writeStartObject()
      g.writeStringField("path", p)
      g.writeArrayFieldStart("bits")
      var i = 0
      while (i < bits.length) { g.writeNumber(bits(i)); i += 1 }
      g.writeEndArray()
      g.writeEndObject()
    }
    g.writeEndArray()
    g.writeEndObject()
    g.close()
    sw.toString
  }

  /** (keyCol, k, path → bits). */
  def parseBloom(json: String): (String, Int, Seq[(String, Array[Long])]) = {
    import com.fasterxml.jackson.core.JsonToken
    val p = mapper.getFactory.createParser(json)
    var keyCol = ""
    var k = 0
    val files = Seq.newBuilder[(String, Array[Long])]
    try {
      p.nextToken() // START_OBJECT
      while (p.nextToken() == JsonToken.FIELD_NAME) {
        p.currentName() match {
          case "keyCol" => p.nextToken(); keyCol = p.getText
          case "k" => p.nextToken(); k = p.getIntValue
          case "files" =>
            p.nextToken() // START_ARRAY
            while (p.nextToken() == JsonToken.START_OBJECT) {
              var path = ""
              var bits = Array.emptyLongArray
              while (p.nextToken() == JsonToken.FIELD_NAME) {
                p.currentName() match {
                  case "path" => p.nextToken(); path = p.getText
                  case "bits" =>
                    p.nextToken() // START_ARRAY
                    val buf = new scala.collection.mutable.ArrayBuffer[Long](1024)
                    while (p.nextToken() != JsonToken.END_ARRAY) buf += p.getLongValue
                    bits = buf.toArray
                  case _ => p.nextToken(); p.skipChildren()
                }
              }
              files += ((path, bits))
            }
          case _ => p.nextToken(); p.skipChildren()
        }
      }
    } finally p.close()
    (keyCol, k, files.result())
  }

  /** Per-file leaf slabs: (cell, cnt, minLat, maxLat, minLon, maxLon). */
  def indexJson(res: Int, files: Seq[(String, Seq[(Long, Long, Double, Double, Double, Double)])]): String = {
    val sw = new java.io.StringWriter(files.map(_._2.size).sum * 64 + 256)
    val g = mapper.getFactory.createGenerator(sw)
    g.writeStartObject()
    g.writeNumberField("res", res)
    g.writeArrayFieldStart("files")
    files.foreach { case (p, leaves) =>
      g.writeStartObject()
      g.writeStringField("path", p)
      g.writeArrayFieldStart("leaves")
      leaves.foreach { case (c, n, la0, la1, lo0, lo1) =>
        g.writeStartArray()
        g.writeNumber(c); g.writeNumber(n)
        g.writeNumber(la0); g.writeNumber(la1)
        g.writeNumber(lo0); g.writeNumber(lo1)
        g.writeEndArray()
      }
      g.writeEndArray()
      g.writeEndObject()
    }
    g.writeEndArray()
    g.writeEndObject()
    g.close()
    sw.toString
  }

  def parseIndex(json: String): (Int, Seq[(String, Seq[(Long, Long, Double, Double, Double, Double)])]) = {
    import com.fasterxml.jackson.core.JsonToken
    val p = mapper.getFactory.createParser(json)
    var res = 0
    val files = Seq.newBuilder[(String, Seq[(Long, Long, Double, Double, Double, Double)])]
    try {
      // {"res": r, "files": [{"path": p, "leaves": [[...], ...]}, ...]}
      p.nextToken() // START_OBJECT
      while (p.nextToken() == JsonToken.FIELD_NAME) {
        p.currentName() match {
          case "res" => p.nextToken(); res = p.getIntValue
          case "files" =>
            p.nextToken() // START_ARRAY
            while (p.nextToken() == JsonToken.START_OBJECT) {
              var path = ""
              val leaves = Seq.newBuilder[(Long, Long, Double, Double, Double, Double)]
              while (p.nextToken() == JsonToken.FIELD_NAME) {
                p.currentName() match {
                  case "path" => p.nextToken(); path = p.getText
                  case "leaves" =>
                    p.nextToken() // START_ARRAY
                    while (p.nextToken() == JsonToken.START_ARRAY) {
                      p.nextToken(); val c = p.getLongValue
                      p.nextToken(); val n = p.getLongValue
                      p.nextToken(); val la0 = p.getDoubleValue
                      p.nextToken(); val la1 = p.getDoubleValue
                      p.nextToken(); val lo0 = p.getDoubleValue
                      p.nextToken(); val lo1 = p.getDoubleValue
                      p.nextToken() // END_ARRAY of the row
                      leaves += ((c, n, la0, la1, lo0, lo1))
                    }
                  case _ => p.nextToken(); p.skipChildren()
                }
              }
              files += ((path, leaves.result()))
            }
          case _ => p.nextToken(); p.skipChildren()
        }
      }
    } finally p.close()
    (res, files.result())
  }
}
