package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DataType

/** (Capability reference: NiFi 2.7 as deployed by
  * /root/reference/dev.nifi.yaml:1.)
  *
  * NiFi record-oriented processors (UpdateRecord, ValidateRecord,
  * SplitRecord, MergeRecord/MergeContent, LookupRecord, Fork/Join
  * Enrichment, SampleRecord, EnforceOrder, SegmentContent, HashContent,
  * AttributeRollingWindow, PartitionRecord) re-expressed as declarative
  * DataFrame transforms.
  *
  * Scale notes per op are on each method; the invariants:
  *  - no `collect()` anywhere — everything stays a Catalyst plan;
  *  - windows partition by a key (never a global single-partition sort
  *    unless the op's semantics demand total order);
  *  - enrichment joins broadcast the small side explicitly.
  */
object Records {

  /** UpdateRecord / UpdateAttribute: derive or overwrite columns.
    * Narrow, codegen'd, zero shuffle. */
  def update(df: DataFrame, cols: (String, Column)*): DataFrame =
    cols.foldLeft(df) { case (d, (n, c)) => d.withColumn(n, c) }

  /** FilterAttribute (NiFi 2.x): RETAIN or REMOVE attributes (columns
    * in this engine's record model) by an enumerated set or a regular
    * expression over the attribute name (NiFi's two matching
    * strategies; the regex must match the WHOLE name, as NiFi's
    * does). `protect` columns survive a remove / are always retained —
    * the analog of NiFi never touching core attributes (uuid,
    * filename, path). A pure projection: Catalyst pushes the pruning
    * into the scan, so a filtered read never deserializes the dropped
    * columns — zero cost at any scale. */
  def filterAttributes(df: DataFrame, retain: Boolean,
                       names: Seq[String] = Nil, regex: Option[String] = None,
                       protect: Seq[String] = Nil): DataFrame = {
    val matched: String => Boolean = regex match {
      case Some(rx) =>
        val p = java.util.regex.Pattern.compile(rx)
        c => p.matcher(c).matches()
      case None =>
        val s = names.toSet
        s.contains _
    }
    val keep = df.columns.filter(c =>
      protect.contains(c) || (matched(c) == retain))
    require(keep.nonEmpty,
      s"filterAttributes: no columns left (of ${df.columns.length})")
    df.select(keep.map(col).toSeq: _*)
  }

  /** ValidateRecord: evaluate named rules; adds `violations` (array of
    * failed rule names) and boolean `is_valid`. Route with
    * [[Route.onAttribute]] on `is_valid` for NiFi's valid/invalid
    * relationships. Narrow, zero shuffle. */
  def validate(df: DataFrame, rules: (String, Column)*): DataFrame = {
    val viols = array(rules.map { case (n, c) =>
      when(!coalesce(c, lit(false)), lit(n))
    }: _*)
    df.withColumn("violations", filter(viols, _.isNotNull))
      .withColumn("is_valid", size(col("violations")) === 0)
  }

  /** ValidateJson: structural validation of a JSON column against a
    * required schema — NiFi ValidateJson with a JSON schema whose
    * `required` array names top-level fields. A record is valid when
    * the document parses (`from_json` yields a non-null struct) AND
    * every required field is present and non-null. Adds a route column
    * (`valid`/`invalid`); filter it for NiFi's two relationships.
    * Narrow, zero shuffle, stays in codegen (JacksonParser). */
  def validateJson(df: DataFrame, jsonCol: String,
                   schema: org.apache.spark.sql.types.StructType,
                   required: Seq[String],
                   routeCol: String = "route"): DataFrame = {
    // PERMISSIVE from_json yields a struct of nulls on malformed input,
    // so parse failure is only observable through the corrupt-record
    // column (a type mismatch on a schema field also lands there —
    // stricter than a bare json_valid, which is what a schema check is).
    val corrupt = "__corrupt"
    require(!schema.fieldNames.contains(corrupt), s"schema may not contain $corrupt")
    val parsed = from_json(col(jsonCol), schema.add(corrupt,
        org.apache.spark.sql.types.StringType),
      Map("mode" -> "PERMISSIVE", "columnNameOfCorruptRecord" -> corrupt))
    val fieldsOk = required.map(f => parsed.getField(f).isNotNull)
      .foldLeft(parsed.isNotNull && parsed.getField(corrupt).isNull)(_ && _)
    df.withColumn(routeCol,
      when(fieldsOk, lit("valid")).otherwise(lit("invalid")))
  }

  /** SplitRecord / SplitText: explode a delimited content column into
    * one row per piece (position preserved). Narrow. */
  def split(df: DataFrame, contentCol: String, delim: String,
            pieceCol: String = "piece", posCol: String = "pos"): DataFrame =
    df.select(col("*"), posexplode(split_part_array(col(contentCol), delim)).as(Seq(posCol, pieceCol)))

  private def split_part_array(c: Column, delim: String): Column =
    org.apache.spark.sql.functions.split(c, java.util.regex.Pattern.quote(delim))

  /** MergeRecord: ordered concatenation of content per group.
    * One shuffle on the group key (map-side partial aggregation applies
    * to the collect). Uses sort-within-struct so order is deterministic
    * without a global sort. */
  def merge(df: DataFrame, groupCols: Seq[String], orderCol: String,
            contentCol: String, sep: String, outCol: String = "merged"): DataFrame =
    df.groupBy(groupCols.map(col): _*)
      .agg(array_join(
        transform(array_sort(collect_list(struct(col(orderCol), col(contentCol)))),
                  s => s.getField(contentCol)),
        sep).as(outCol))

  /** MergeContent bin-packing: assign each record a bin id per group such
    * that bins hold ~`binCap` of `sizeCol`. Streamable definition
    * (identical in SQL): bin = floor((running_sum - size) / binCap),
    * i.e. a record opens a new bin when the bytes before it fill the
    * current bin. One shuffle on the group key. */
  def binPack(df: DataFrame, groupCols: Seq[String], orderCol: String,
              sizeCol: String, binCap: Long, binCol: String = "bin"): DataFrame = {
    val w = Window.partitionBy(groupCols.map(col): _*).orderBy(col(orderCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    df.withColumn(binCol, floor((sum(col(sizeCol)).over(w) - col(sizeCol)) / binCap))
  }

  /** LookupRecord: enrich against a (small) lookup table. The lookup
    * side is broadcast — no shuffle of the fact side, which is the only
    * plan that survives a 100 TB fact table. */
  def lookup(df: DataFrame, lookupDf: DataFrame, keys: Seq[(String, String)],
             how: String = "left"): DataFrame = {
    val cond = keys.map { case (l, r) => df(l) === lookupDf(r) }.reduce(_ && _)
    df.join(broadcast(lookupDf), cond, how)
  }

  /** LookupAttribute (NiFi SimpleKeyValueLookupService): enrich from a
    * STATIC key→value mapping carried as a literal map expression — no
    * join, no broadcast table, no shuffle; the map rides inside the
    * plan and stays in whole-stage codegen. For table-sized lookups use
    * [[lookup]] (broadcast join); this is for config-sized maps
    * (country codes, tier names) where even a broadcast is overhead. */
  def lookupAttribute(df: DataFrame, keyCol: String, mapping: Map[String, String],
                      outCol: String, default: Option[String] = None): DataFrame = {
    require(mapping.nonEmpty, "lookupAttribute needs a non-empty mapping")
    val hit = element_at(typedLit(mapping), col(keyCol).cast("string"))
    df.withColumn(outCol, default.fold(hit)(d => coalesce(hit, lit(d))))
  }

  /** Wait/Notify (NiFi's release-gate pair), batch form: a row whose
    * release key has a row in `signals` routes `success`, the rest
    * route `wait` (re-run the gate when more signals land — NiFi's
    * polling loop becomes re-execution of a declarative plan). The
    * signal side is distinct-projected and broadcast when small
    * (Catalyst's call via AQE); the waiting side never shuffles in the
    * broadcast plan. Streaming form: a stream-stream join within a
    * watermark interval ([[graft.streaming.Streams.joinWithinInterval]]). */
  def waitRelease(df: DataFrame, signals: DataFrame,
                  keys: Seq[(String, String)],
                  routeCol: String = "route"): DataFrame = {
    val marker = "__signaled"
    val sig = signals.select(keys.map { case (_, r) => col(r) }: _*)
      .distinct().withColumn(marker, lit(true))
    val cond = keys.map { case (l, r) => df(l) === sig(r) }.reduce(_ && _)
    val tagged = df.join(sig, cond, "left")
      .withColumn(routeCol, when(col(marker).isNotNull, lit("success")).otherwise(lit("wait")))
    keys.map { case (_, r) => sig(r) }
      .foldLeft(tagged)((d, c) => d.drop(c))
      .drop(marker)
  }

  /** RetryFlowFile (NiFi): bump the retry counter and route `retry`
    * until `maxRetries` attempts are spent, then `retries_exceeded`.
    * Creates the counter at 0 when absent. Narrow. */
  def retryFlowFile(df: DataFrame, retriesCol: String = "flowfile_retries",
                    maxRetries: Int = 3, routeCol: String = "route"): DataFrame = {
    val seeded = if (df.columns.contains(retriesCol)) df
                 else df.withColumn(retriesCol, lit(0))
    seeded.withColumn(retriesCol, coalesce(col(retriesCol), lit(0)) + lit(1))
      .withColumn(routeCol,
        when(col(retriesCol) <= maxRetries, lit("retry")).otherwise(lit("retries_exceeded")))
  }

  /** ForkEnrichment/JoinEnrichment: compute an aggregate view of the
    * stream and re-join it onto the original rows. The enrichment is
    * derived from the SAME scan (Spark reuses the exchange); join key is
    * the group key, so the join co-partitions with the aggregation. */
  def forkJoinEnrich(df: DataFrame, keyCols: Seq[String],
                     enrich: DataFrame => DataFrame): DataFrame = {
    val side = enrich(df)
    df.join(side, keyCols, "left")
  }

  /** SampleRecord: deterministic hash-bucket sampling — stable across
    * runs and partitionings (unlike `df.sample`). Keeps rows whose
    * key hashes into `bucket` of `modulus`. Narrow. */
  def sample(df: DataFrame, keyCol: String, modulus: Int, bucket: Int = 0): DataFrame =
    df.filter(pmod(xxhash64(col(keyCol)), lit(modulus)) === bucket)

  /** SampleRecord on a numeric key without hashing (portable across
    * engines — used where an external oracle must reproduce the bucket). */
  def sampleByMod(df: DataFrame, keyCol: String, modulus: Int, bucket: Int): DataFrame =
    df.filter(pmod(col(keyCol), lit(modulus)) === bucket)

  /** EnforceOrder: per-key sequence index by an ordering column.
    * One shuffle on the key. */
  def enforceOrder(df: DataFrame, partCols: Seq[String], orderCols: Seq[String],
                   idxCol: String = "seq"): DataFrame = {
    val w = Window.partitionBy(partCols.map(col): _*).orderBy(orderCols.map(col): _*)
    df.withColumn(idxCol, row_number().over(w))
  }

  /** CryptographicHashAttribute: digest each named attribute column
    * into `<col><suffix>`. Per-column analog of [[hashContent]] (NiFi
    * separates the two processors; both are narrow codegen'd scans). */
  def hashAttributes(df: DataFrame, cols: Seq[String], algo: String = "sha256",
                     suffix: String = "_hash"): DataFrame = {
    def digest(c: Column): Column = algo match {
      case "md5"      => md5(c.cast("binary"))
      case "sha1"     => sha1(c.cast("binary"))
      case "sha256"   => sha2(c.cast("binary"), 256)
      case "sha512"   => sha2(c.cast("binary"), 512)
      case "xxhash64" => xxhash64(c)
      case other      => throw new IllegalArgumentException(s"unknown algo $other")
    }
    cols.foldLeft(df)((d, c) => d.withColumn(c + suffix, digest(col(c))))
  }

  /** VerifyContentMAC, signing leg: HMAC of the content column under a
    * shared secret key (hex-encoded output alongside the payload). The
    * key is config — it rides in the plan, never in a column. */
  def macContent(df: DataFrame, contentCol: String, key: Array[Byte],
                 algorithm: String = "HmacSHA256",
                 outCol: String = "content_mac"): DataFrame =
    df.withColumn(outCol,
      hex(graft.plans.BinaryExpressions.hmac(col(contentCol).cast("binary"), key, algorithm)))

  /** VerifyContentMAC, verification leg: recompute the HMAC and route
    * `success`/`failure` on constant-content equality with the claimed
    * MAC column (hex, case-insensitive). Narrow, zero shuffle. */
  def verifyMac(df: DataFrame, contentCol: String, macCol: String,
                key: Array[Byte], algorithm: String = "HmacSHA256",
                routeCol: String = "route"): DataFrame = {
    val expect = hex(graft.plans.BinaryExpressions.hmac(col(contentCol).cast("binary"), key, algorithm))
    df.withColumn(routeCol,
      when(upper(col(macCol)) === upper(expect), lit("success")).otherwise(lit("failure")))
  }

  /** SegmentContent: split content into fixed-size character chunks, one
    * row per chunk. Narrow (sequence+transform+explode, all codegen'd). */
  def segment(df: DataFrame, contentCol: String, size: Int,
              chunkCol: String = "chunk", idxCol: String = "chunk_idx"): DataFrame = {
    val starts = sequence(lit(1), greatest(length(col(contentCol)), lit(1)), lit(size))
    df.select(col("*"),
        posexplode(transform(starts, s => col(contentCol).substr(s, lit(size))))
          .as(Seq(idxCol, chunkCol)))
      .withColumn(chunkCol, col(chunkCol).cast("string"))
  }

  /** MergeContent "Defragment" mode: reassemble [[segment]]'s chunks
    * (or any fragment stream carrying NiFi's fragment.identifier /
    * fragment.index pair) back into whole content — one shuffle on the
    * fragment id, order restored by sorting the collected
    * (index, chunk) structs INSIDE each group (array_sort on the
    * struct's leading index field; no window, no second shuffle).
    * Fragment count per id is bounded by the original content size /
    * segment size, so the per-group array is content-sized — the same
    * memory contract as the original row.
    *
    * The index is coerced to long INSIDE the struct: NiFi's
    * fragment.index attribute arrives as a STRING, and a lexical sort
    * would order '10' before '2' and silently reassemble corrupted
    * content past 9 fragments. */
  def defragment(df: DataFrame, idCol: String, idxCol: String, chunkCol: String,
                 outCol: String = "content"): DataFrame =
    df.groupBy(col(idCol))
      .agg(array_join(transform(
        array_sort(collect_list(struct(
          col(idxCol).cast("long").as("i"), col(chunkCol).as("c")))),
        x => x.getField("c")), "").as(outCol))

  /** HashContent: content digest column. md5 / sha2-256 / xxhash64. */
  def hashContent(df: DataFrame, contentCol: String, algo: String = "md5",
                  outCol: String = "content_hash"): DataFrame = {
    val h = algo match {
      case "md5"    => md5(col(contentCol).cast("binary"))
      case "sha256" => sha2(col(contentCol).cast("binary"), 256)
      case "xxhash64" => xxhash64(col(contentCol))
      case other    => throw new IllegalArgumentException(s"unknown algo $other")
    }
    df.withColumn(outCol, h)
  }

  /** AttributeRollingWindow: per-key rolling aggregate over a trailing
    * time range (milliseconds). Uses a RANGE window frame on the epoch —
    * no self-join, one shuffle on the key. */
  def rollingWindow(df: DataFrame, partCol: String, tsCol: String, valueCol: String,
                    rangeMs: Long, outCol: String = "rolling_sum"): DataFrame = {
    val w = Window.partitionBy(col(partCol)).orderBy(unix_millis(col(tsCol)))
      .rangeBetween(-rangeMs, 0)
    df.withColumn(outCol, sum(col(valueCol)).over(w))
  }

  /** Top-N per key (NiFi PrioritizeAttribute-style selection). Shuffles
    * once on the key; with AQE the per-key sort is skew-aware. */
  def topNPerKey(df: DataFrame, partCols: Seq[String], orderCols: Seq[Column], n: Int,
                 rankCol: String = "rk"): DataFrame = {
    val w = Window.partitionBy(partCols.map(col): _*).orderBy(orderCols: _*)
    df.withColumn(rankCol, row_number().over(w)).filter(col(rankCol) <= n)
  }

  /** ExtractText: regex capture groups → named columns. Narrow. */
  def extractText(df: DataFrame, srcCol: String, pattern: String,
                  groups: Seq[(String, Int)]): DataFrame =
    groups.foldLeft(df) { case (d, (name, g)) =>
      d.withColumn(name, regexp_extract(col(srcCol), pattern, g))
    }

  /** ReplaceText: regex rewrite (replace-all, NiFi's default). Narrow. */
  def replaceText(df: DataFrame, contentCol: String, pattern: String,
                  replacement: String, outCol: String = null): DataFrame =
    df.withColumn(if (outCol == null) contentCol else outCol,
      regexp_replace(col(contentCol), pattern, replacement))

  /** EvaluateJsonPath: extract scalar JSON paths into columns.
    * `paths` maps out-column -> JSON path (e.g. "$.k"). Narrow. */
  def jsonPath(df: DataFrame, jsonCol: String, paths: (String, String)*): DataFrame =
    paths.foldLeft(df) { case (d, (name, p)) =>
      d.withColumn(name, get_json_object(col(jsonCol), p))
    }

  /** FlattenJson / JoltTransform-shape: parse a JSON column with a schema
    * and flatten its top-level fields into columns. Narrow. */
  def flattenJson(df: DataFrame, jsonCol: String, schema: DataType,
                  prefix: String = ""): DataFrame = {
    val parsed = df.withColumn("__j", from_json(col(jsonCol), schema))
    val fields = schema.asInstanceOf[org.apache.spark.sql.types.StructType].fieldNames
    fields.foldLeft(parsed) { (d, f) =>
      d.withColumn(prefix + f, col("__j").getField(f))
    }.drop("__j")
  }

  /** JoltTransformJSON (shift + default subset): restructure a JSON
    * string column per a declarative spec.
    *  - `shift`: (source JSONPath-ish `$.a.b`, destination dotted path
    *    `x.y`) — the value moves to the new location;
    *  - `defaults`: (destination path, literal) — fills the slot when
    *    the shifted value is absent (Jolt's default semantics).
    * Values are string-typed (`get_json_object` extraction); nesting in
    * destination paths builds nested structs. A shifted path that is
    * absent in the input AND has no default renders as an omitted field
    * (to_json drops nulls — Jolt's remove-on-missing behavior). Narrow,
    * codegen'd — the whole transform is one expression tree per record. */
  def joltTransform(df: DataFrame, jsonCol: String,
                    shift: Seq[(String, String)],
                    defaults: Seq[(String, String)] = Nil,
                    outCol: String = "jolted"): DataFrame = {
    // leaf expression per destination path: shifted value with default
    // fallback (defaults-only paths become constants)
    val leaves = scala.collection.mutable.LinkedHashMap.empty[String, Column]
    for ((src, dst) <- shift)
      leaves(dst) = get_json_object(col(jsonCol), src)
    for ((dst, v) <- defaults)
      leaves(dst) = leaves.get(dst).map(c => coalesce(c, lit(v))).getOrElse(lit(v))
    // fold dotted destination paths into nested structs, preserving
    // first-seen order at every level
    def build(paths: Seq[(List[String], Column)]): Column = {
      val grouped = scala.collection.mutable.LinkedHashMap.empty[String, scala.collection.mutable.ArrayBuffer[(List[String], Column)]]
      for ((segs, c) <- paths)
        grouped.getOrElseUpdate(segs.head, scala.collection.mutable.ArrayBuffer.empty) += ((segs, c))
      struct(grouped.map { case (seg, entries) =>
        val (leafEntries, deeper) = entries.partition(_._1.lengthCompare(1) == 0)
        require(leafEntries.isEmpty || deeper.isEmpty,
          s"jolt spec: '$seg' is both a leaf and a branch")
        val c = if (deeper.isEmpty) leafEntries.head._2
                else build(deeper.map { case (segs, c) => (segs.tail, c) }.toSeq)
        c.as(seg)
      }.toSeq: _*)
    }
    val tree = build(leaves.toSeq.map { case (p, c) => (p.split("\\.").toList, c) })
    df.withColumn(outCol, to_json(tree))
  }

  /** JoltTransformJSON, full chained DSL (r17): shift with `*`/`|`
    * wildcards and `&` references, default, remove, cardinality,
    * modify-overwrite-beta — chained in spec order. The static
    * [[joltTransform]] stays the codegen'd fast path when the spec is
    * a fixed shift+default; this form interprets the spec per row
    * ([[Jolt]]) because wildcard matches depend on each document's
    * keys. The spec parses + validates ONCE here (flow-compile time),
    * NiFi's processor-validation behavior. */
  def joltTransformChain(df: DataFrame, jsonCol: String, specJson: String,
                         outCol: String = "jolted"): DataFrame = {
    graft.operators.Jolt.chain(specJson) // validate now, not per row
    df.withColumn(outCol, graft.plans.JoltTransform(col(jsonCol), specJson))
  }

  /** PartitionRecord: derive a partition key column; pair with
    * `.write.partitionBy` or `.repartition` for physical layout. */
  def partitionKey(df: DataFrame, keyCol: String, key: Column): DataFrame =
    df.withColumn(keyCol, key)

  /** CompressContent: compress a payload column in place (binary →
    * binary), per-record — the NiFi semantic, unlike write-side codec
    * compression. Codecs: gzip | zstd | lz4 | snappy (NiFi's set; each
    * backed by the codec jar Spark already ships). Narrow. */
  def compress(df: DataFrame, contentCol: String, outCol: String = null,
               codec: String = "gzip"): DataFrame = {
    val payload = col(contentCol).cast("binary")
    val compressed = codec.toLowerCase match {
      case "gzip"   => graft.plans.BinaryExpressions.gzip(payload)
      case "zstd"   => graft.plans.BinaryExpressions.zstd(payload)
      case "lz4"    => graft.plans.BinaryExpressions.lz4(payload)
      case "snappy" => graft.plans.BinaryExpressions.snappy(payload)
      case other    => throw new IllegalArgumentException(
        s"unsupported codec '$other' (gzip|zstd|lz4|snappy)")
    }
    df.withColumn(if (outCol == null) contentCol else outCol, compressed)
  }

  /** CompressContent (decompress mode); same codec set. */
  def decompress(df: DataFrame, contentCol: String, outCol: String = null,
                 codec: String = "gzip"): DataFrame = {
    val payload = col(contentCol)
    val plain = codec.toLowerCase match {
      case "gzip"   => graft.plans.BinaryExpressions.gunzip(payload)
      case "zstd"   => graft.plans.BinaryExpressions.unzstd(payload)
      case "lz4"    => graft.plans.BinaryExpressions.unlz4(payload)
      case "snappy" => graft.plans.BinaryExpressions.unsnappy(payload)
      case other    => throw new IllegalArgumentException(
        s"unsupported codec '$other' (gzip|zstd|lz4|snappy)")
    }
    df.withColumn(if (outCol == null) contentCol else outCol, plain)
  }

  /** EncryptContent: AES-GCM payload encryption with Spark's native
    * expression (codegen'd, per-record — NiFi's EncryptContent grain).
    * GCM prepends a random IV, so ciphertexts differ run to run;
    * [[decryptContent]] is the inverse. Key must be 16/24/32 bytes. */
  def encryptContent(df: DataFrame, contentCol: String, key: String,
                     outCol: String = "encrypted"): DataFrame =
    df.withColumn(outCol,
      aes_encrypt(col(contentCol).cast("binary"), lit(key.getBytes("UTF-8"))))

  /** EncryptContent (decrypt mode). */
  def decryptContent(df: DataFrame, contentCol: String, key: String,
                     outCol: String = "decrypted"): DataFrame =
    df.withColumn(outCol,
      aes_decrypt(col(contentCol), lit(key.getBytes("UTF-8"))))

  /** ScanContent/ScanAttribute: match content against a dictionary of
    * terms; adds an array of the terms found (dictionary order).
    * Narrow, codegen'd — the dictionary is a literal array, no join. */
  def scanContent(df: DataFrame, contentCol: String, dictionary: Seq[String],
                  outCol: String = "matched_terms"): DataFrame =
    df.withColumn(outCol,
      filter(array(dictionary.map(lit): _*), t => contains(col(contentCol), t)))

  /** AttributesToJSON: serialize selected columns as a JSON object
    * column (NiFi's attribute envelope). */
  def attributesToJson(df: DataFrame, cols: Seq[String],
                       outCol: String = "attrs_json"): DataFrame =
    df.withColumn(outCol, to_json(struct(cols.map(col): _*)))

  /** ModifyBytes (NiFi): trim a fixed number of bytes from the head and
    * tail of a binary payload (fixed-length header/trailer stripping).
    * Shorter payloads yield empty, never error. Narrow, codegen'd. */
  def modifyBytes(df: DataFrame, payloadCol: String, dropHead: Int, dropTail: Int,
                  outCol: String = "trimmed"): DataFrame = {
    // cast to binary (no-op when already binary): offsets are BYTES —
    // substr on a string column counts CHARACTERS, so multibyte text
    // would trim at the wrong boundary vs the octet_length arithmetic
    val payload = col(payloadCol).cast("binary")
    val len = greatest(octet_length(payload) - dropHead - dropTail, lit(0))
    df.withColumn(outCol, payload.substr(lit(dropHead + 1), len))
  }

  /** SplitContent (NiFi): one output row per segment of a binary
    * payload split at a delimiter byte sequence (native expression;
    * empty segments kept). Adds (seg_idx from 1, segment). The payload
    * is cast to binary (no-op when already binary) — SplitBinary's
    * nullSafeEval reads Array[Byte], a raw string column would CCE. */
  def splitContent(df: DataFrame, payloadCol: String, delim: Array[Byte],
                   outCol: String = "segment"): DataFrame =
    df.select(col("*"),
        posexplode(graft.plans.BinaryExpressions.splitBinary(
          col(payloadCol).cast("binary"), lit(delim))).as(Seq("__i", outCol)))
      .withColumn("seg_idx", col("__i") + 1).drop("__i")

  /** ValidateXml (NiFi XML reader validation): parse against a schema
    * and route on whether `requiredField` materialized — malformed XML
    * or a missing mandatory element fails validation. */
  def validateXml(df: DataFrame, xmlCol: String,
                  schema: org.apache.spark.sql.types.StructType,
                  requiredField: String, outCol: String = "xml_valid"): DataFrame =
    df.withColumn("__x", from_xml(col(xmlCol), lit(schema.toDDL)))
      .withColumn(outCol, col(s"__x.$requiredField").isNotNull)
      .drop("__x")

  /** TransformXml (NiFi): apply an XSLT 1.0 stylesheet to an XML
    * payload column via the JDK's javax.xml.transform. The stylesheet
    * is compiled to a `Templates` ONCE per partition (Templates is
    * thread-safe; per-row `Transformer`s are cheap after compilation),
    * so the operator is narrow, distributed, and amortizes compilation
    * like NiFi's processor-level stylesheet cache. External DTD /
    * stylesheet resolution is DISABLED (no XXE, no egress). Rows whose
    * payload fails to parse get null output + the error message in
    * `<outCol>_error` — NiFi's failure relationship. */
  def transformXml(df: DataFrame, xmlCol: String, xslt: String,
                   outCol: String = "transformed"): DataFrame = {
    import org.apache.spark.sql.types.{StringType, StructField, StructType}
    val outSchema = StructType(df.schema.fields ++ Seq(
      StructField(outCol, StringType, nullable = true),
      StructField(s"${outCol}_error", StringType, nullable = true)))
    val xmlIdx = df.schema.fieldIndex(xmlCol)
    df.mapPartitions { rows: Iterator[org.apache.spark.sql.Row] =>
      val factory = javax.xml.transform.TransformerFactory.newInstance()
      try {
        factory.setAttribute(javax.xml.XMLConstants.ACCESS_EXTERNAL_DTD, "")
        factory.setAttribute(javax.xml.XMLConstants.ACCESS_EXTERNAL_STYLESHEET, "")
      } catch { case _: IllegalArgumentException => () } // factory w/o the attrs
      val templates = factory.newTemplates(new javax.xml.transform.stream.StreamSource(
        new java.io.StringReader(xslt)))
      rows.map { r =>
        val (out, err) =
          if (r.isNullAt(xmlIdx)) (null, "null xml payload")
          else try {
            val w = new java.io.StringWriter()
            templates.newTransformer().transform(
              new javax.xml.transform.stream.StreamSource(
                new java.io.StringReader(r.getString(xmlIdx))),
              new javax.xml.transform.stream.StreamResult(w))
            (w.toString, null)
          } catch {
            case e: Exception => (null, s"${e.getClass.getSimpleName}: ${e.getMessage}")
          }
        org.apache.spark.sql.Row.fromSeq(r.toSeq ++ Seq(out, err))
      }
    }(org.apache.spark.sql.Encoders.row(outSchema))
  }

  /** AttributesToCSV (NiFi): selected columns as one RFC-4180 line —
    * values holding a delimiter/quote/newline are quoted, embedded
    * quotes doubled, nulls empty. Narrow, codegen'd. */
  def attributesToCsv(df: DataFrame, cols: Seq[String],
                      outCol: String = "attrs_csv"): DataFrame = {
    val cells = cols.map { c =>
      val s = coalesce(col(c).cast("string"), lit(""))
      when(s.rlike("[\",\\n\\r]"),
        concat(lit("\""), regexp_replace(s, "\"", "\"\""), lit("\"")))
        .otherwise(s)
    }
    df.withColumn(outCol, concat_ws(",", cells: _*))
  }

  /** ConvertRecord at the CONTENT grain (NiFi's most-used processor:
    * Record Reader → Record Writer format conversion): each row's
    * content column holds one serialized record (a JSON object or a
    * CSV line); it is parsed with the supplied schema and re-emitted
    * in the target format. Narrow and codegen'd (from_json/from_csv →
    * to_json/to_csv) — the TABLE-grain form (whole files between
    * formats) is [[graft.sources.Io.convert]]. CSV output follows
    * Spark's to_csv quoting (RFC-4180 compatible). */
  def convertRecordFormat(df: DataFrame, contentCol: String,
                          readerFormat: String, writerFormat: String,
                          schemaDdl: String, outCol: String = "converted"): DataFrame = {
    val schema = org.apache.spark.sql.types.StructType.fromDDL(schemaDdl)
    val parsed = readerFormat.trim.toLowerCase match {
      case "json" => from_json(col(contentCol).cast("string"), schema)
      case "csv"  => from_csv(col(contentCol).cast("string"), schema, Map.empty[String, String])
      // r16: bare Avro-binary records (AvroReader) — the container-file
      // grain stays in sources.AvroIo; malformed payloads → NULL rows
      case "avro" => graft.plans.AvroExpressions.avroDecode(
        col(contentCol).cast("binary"), schemaDdl)
      // r17: XMLReader — one XML element per record (builtin from_xml;
      // any root tag, child elements bind by field name)
      case "xml"  => from_xml(col(contentCol).cast("string"), schema)
      case f => throw new IllegalArgumentException(
        s"ConvertRecord: unknown Record Reader format '$f' (json|csv|avro|xml)")
    }
    val out = writerFormat.trim.toLowerCase match {
      case "json" => (c: Column) => to_json(c)
      case "csv"  => (c: Column) => to_csv(c)
      case "avro" => (c: Column) => graft.plans.AvroExpressions.avroEncode(c, schemaDdl)
      // r17: XMLRecordSetWriter — builtin to_xml (default <ROW> root)
      case "xml"  => (c: Column) => to_xml(c)
      case f => throw new IllegalArgumentException(
        s"ConvertRecord: unknown Record Writer format '$f' (json|csv|avro|xml)")
    }
    df.withColumn(outCol, out(parsed))
  }

  /** ValidateCsv (NiFi standard bundle; schema = the super-csv
    * cell-processor DSL NiFi exposes): each row's content column holds
    * ONE CSV line; cells parse through the builtin from_csv (RFC-4180
    * quoting — a naive split would break on quoted commas) and each
    * cell's processor chain becomes a codegen'd Column predicate, so
    * validation rides the scan. Routes `valid`/`invalid` in
    * `routeCol` (the DetectDuplicate route discipline — connections
    * select the relationship).
    *
    * Cell-processor subset (parsed + validated HERE, NiFi's
    * processor-config moment; unknown processors throw):
    * `NotNull`, `Null`, `Optional(inner)` (null passes, else inner),
    * `ParseLong`/`ParseInt` (integer text), `ParseDouble` (castable),
    * `ParseBool` (super-csv's true/false/t/f/y/n/1/0),
    * `StrMinMax(min,max)` (length bounds), `Strlen(n)`,
    * `StrRegEx("re")` (anchored), `IsIncludedIn("a","b",…)`,
    * `Unique()` (value seen once across the batch — the one STATEFUL
    * processor: a count window on the cell value, i.e. one shuffle;
    * NiFi tracks it in per-file memory, the batch IS the file here).
    * A line with missing cells fails non-Optional processors (the
    * missing cell is null); extra trailing cells fail the line
    * (detected via a probe column past the schema width). */
  def validateCsv(df: DataFrame, contentCol: String, schema: String,
                  routeCol: String = "route",
                  delimiter: String = ","): DataFrame = {
    val procs = CsvCells.parseSchema(schema) // throws on a bad DSL
    val n = procs.length
    // n declared cells + 1 probe: a non-null probe = extra cells
    val ddl = ((0 until n).map(i => s"_c$i STRING") :+ s"_c$n STRING").mkString(", ")
    val opts = Map("delimiter" -> delimiter, "mode" -> "PERMISSIVE")
    val parsed = from_csv(col(contentCol).cast("string"),
      org.apache.spark.sql.types.StructType.fromDDL(ddl), opts)
    val withCells = df.withColumn("__csv", parsed)
    val cellCols = (0 until n).map(i => org.apache.spark.sql.functions.col(s"__csv._c$i"))
    // EVERY cell's stateless predicate applies — including Unique()
    // cells, whose pred is isNotNull (super-csv's Unique/UniqueHashCode
    // reject a null cell; only Optional(Unique()) lets null through).
    // Dropping it (pre-r18) routed a lone-null Unique cell 'valid'.
    val stateless = procs.zip(cellCols).map { case (p, c) => p.pred(c) }
    val noExtra = col(s"__csv._c$n").isNull
    val statelessOk = (stateless :+ noExtra).reduce(_ && _)
    // Unique() cells: value-seen-once via a count window per cell
    val uniqueIdx = procs.zipWithIndex.collect { case (p, i) if p.isUnique => i }
    val withUnique = uniqueIdx.foldLeft(withCells) { (acc, i) =>
      val w = org.apache.spark.sql.expressions.Window.partitionBy(col(s"__csv._c$i"))
      acc.withColumn(s"__uniq$i", count(lit(1)).over(w) === 1)
    }
    // null cells bypass the count window (Optional(Unique()) passes a
    // null per super-csv's short-circuit; a bare Unique() null already
    // failed its isNotNull stateless pred above)
    val uniqueOk = uniqueIdx.map(i => col(s"__csv._c$i").isNull || col(s"__uniq$i"))
    val allOk = (statelessOk +: uniqueOk).reduce(_ && _)
    withUnique
      .withColumn(routeCol, when(coalesce(allOk, lit(false)), "valid").otherwise("invalid"))
      .drop("__csv")
      .drop(uniqueIdx.map(i => s"__uniq$i"): _*)
  }

  /** FuzzyHashContent (NiFi): context-triggered piecewise hash of the
    * content (ssdeep-style CTPH — see [[graft.plans.FuzzyHash]]):
    * localized edits change only the digest characters of the chunks
    * they touch, so near-identical payloads get near-identical digests.
    * Digest format "blocksize:digest:digest2x". Narrow native
    * expression, one pass per payload. */
  def fuzzyHashContent(df: DataFrame, contentCol: String,
                       outCol: String = "fuzzy_hash"): DataFrame =
    df.withColumn(outCol, graft.plans.FuzzyHashExpr(col(contentCol)))

  /** Similarity of two CTPH digests in [0, 100]: Levenshtein ratio over
    * the matching-granularity digest pair — equal block sizes compare
    * both digests (best wins), adjacent block sizes compare the
    * cross-granularity pair, anything further apart is incomparable
    * (0). All builtin codegen'd expressions. */
  def fuzzyHashSimilarity(a: Column, b: Column): Column = {
    def part(c: Column, i: Int) =
      element_at(org.apache.spark.sql.functions.split(c, ":", -1), i)
    def bsOf(c: Column) = part(c, 1).cast("long")
    def ratio(x: Column, y: Column): Column =
      round((lit(1.0) - levenshtein(x, y) /
        greatest(length(x), length(y), lit(1)).cast("double")) * 100)
    val (aBs, bBs) = (bsOf(a), bsOf(b))
    when(aBs === bBs,
        greatest(ratio(part(a, 2), part(b, 2)), ratio(part(a, 3), part(b, 3))))
      .when(aBs === bBs * 2, ratio(part(a, 2), part(b, 3)))
      .when(aBs * 2 === bBs, ratio(part(a, 3), part(b, 2)))
      .otherwise(lit(0.0))
  }

  /** DuplicateFlowFile (NiFi): emit `copies` EXTRA rows per record for
    * load generation/testing — `copy_idx` 0 is the original, 1..copies
    * the duplicates. Narrow explode, no shuffle. */
  def duplicateRows(df: DataFrame, copies: Int,
                    idxCol: String = "copy_idx"): DataFrame = {
    require(copies >= 0, "copies must be >= 0")
    df.withColumn(idxCol, explode(sequence(lit(0), lit(copies))))
  }

  /** UpdateCounter (NiFi): named side-channel counters incremented as
    * records flow past, WITHOUT forking the plan or breaking codegen —
    * Spark-first this is `Dataset.observe`: the counters ride the
    * existing job as observed metrics and surface per action through
    * `QueryExecutionListener` / `df.collectResult` observedMetrics (the
    * same listener surface `graft.Provenance` uses). `counters` maps
    * counter name → predicate (use `lit(true)` for every-record). */
  def updateCounter(df: DataFrame, observationName: String,
                    counters: Map[String, org.apache.spark.sql.Column]): DataFrame = {
    require(counters.nonEmpty, "at least one counter")
    val aggs = counters.toSeq.map { case (name, pred) =>
      count(when(pred, lit(1))).as(name)
    }
    df.observe(observationName, aggs.head, aggs.tail: _*)
  }

  /** CalculateRecordStats (NiFi): total record count plus per-value
    * counts for each category column, as (stat, value, n) rows. Each
    * category is one map-side-combined groupBy; no joins. */
  def recordStats(df: DataFrame, categoryCols: Seq[String]): DataFrame = {
    val total = df.agg(count(lit(1)).as("n"))
      .select(lit("total").as("stat"), lit(null).cast("string").as("value"), col("n"))
    categoryCols
      .map(c => df.groupBy(col(c).cast("string").as("value"))
        .agg(count(lit(1)).as("n"))
        .select(lit(c).as("stat"), col("value"), col("n")))
      .foldLeft(total)(_ unionByName _)
  }

  /** ConvertJSONToSQL (NiFi): turn a JSON object column into an INSERT
    * statement for `table`. `cols` maps field name → true when the SQL
    * literal must be quoted (strings; '' doubling), false for numerics
    * (emitted verbatim). JSON nulls/absent fields become SQL NULL. */
  def jsonToSql(df: DataFrame, jsonCol: String, table: String,
                cols: Seq[(String, Boolean)], outCol: String = "sql"): DataFrame = {
    val values = cols.map { case (name, quoted) =>
      val v = get_json_object(col(jsonCol), s"$$.$name")
      val literal =
        if (quoted) concat(lit("'"), regexp_replace(v, "'", "''"), lit("'")) else v
      coalesce(literal, lit("NULL"))
    }
    df.withColumn(outCol, concat(
      lit(s"INSERT INTO $table (${cols.map(_._1).mkString(", ")}) VALUES ("),
      concat_ws(", ", values: _*), lit(")")))
  }

  /** ExecuteScript: arbitrary per-record logic as a JVM function —
    * NiFi's scripting escape hatch. LAST RESORT by design: a black-box
    * function breaks whole-stage codegen, predicate pushdown, and
    * column pruning, so every other operator in this package should be
    * preferred; this exists for the genuinely-imperative remainder.
    * The operator stays narrow (no shuffle) and distributed. */
  /** ExecuteStreamCommand (NiFi): stream records through an EXTERNAL
    * command's stdin/stdout. One process per PARTITION (rdd.pipe), not
    * per record — records flow as lines, so a 100 TB scan spawns
    * `numPartitions` processes total, pipelined. Line-oriented
    * contract: each input row's `contentCol` is one stdin line; every
    * stdout line becomes one output row (a pure per-line filter like
    * grep may emit fewer rows; an enricher like `tr` emits 1:1 —
    * alignment is the command's responsibility, as in NiFi). Last-
    * resort escape hatch like [[executeScript]]: the command is opaque
    * to Catalyst (no pushdown/codegen through it). */
  def executeStreamCommand(df: DataFrame, contentCol: String,
                           command: Seq[String],
                           outCol: String = "line"): DataFrame = {
    require(command.nonEmpty, "command must not be empty")
    val spark = df.sparkSession
    val piped = df.select(col(contentCol).cast("string"))
      .rdd.map(_.getString(0)).pipe(command)
    spark.createDataFrame(piped.map(org.apache.spark.sql.Row(_)),
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField(outCol,
          org.apache.spark.sql.types.StringType))))
  }

  def executeScript(df: DataFrame, outSchema: org.apache.spark.sql.types.StructType)
                   (fn: org.apache.spark.sql.Row => org.apache.spark.sql.Row): DataFrame =
    df.map(fn)(org.apache.spark.sql.Encoders.row(outSchema))

  /** ExecuteStreamCommand-shaped variant: the function sees a whole
    * partition's iterator (amortize per-batch setup — external process,
    * model handle, dictionary — across the partition, the same reason
    * NiFi streams a FlowFile through one spawned process). */
  def executeScriptPartitions(df: DataFrame, outSchema: org.apache.spark.sql.types.StructType)
                             (fn: Iterator[org.apache.spark.sql.Row] => Iterator[org.apache.spark.sql.Row]): DataFrame =
    df.mapPartitions(fn)(org.apache.spark.sql.Encoders.row(outSchema))

  /** DistributeLoad: spread rows across `n` partitions (round-robin) or
    * co-locate by key columns — NiFi's load-balancing relationship,
    * expressed as an explicit exchange. */
  def distributeLoad(df: DataFrame, n: Int, keyCols: Seq[String] = Nil): DataFrame =
    if (keyCols.isEmpty) df.repartition(n)
    else df.repartition(n, keyCols.map(col): _*)

  /** ConvertCharacterSet: re-encode a binary payload between charsets
    * (NiFi ConvertCharacterSet). */
  def convertCharset(df: DataFrame, payloadCol: String, from: String, to: String,
                     outCol: String = null): DataFrame =
    df.withColumn(if (outCol == null) payloadCol else outCol,
      encode(decode(col(payloadCol), from), to))

  /** IdentifyMimeType: magic-byte sniffing on a binary payload column.
    * Covers the formats a training-data pipeline meets; unknown →
    * 'application/octet-stream'. Narrow, codegen'd (hex-prefix
    * comparisons). */
  def identifyMime(df: DataFrame, payloadCol: String,
                   outCol: String = "mime_type"): DataFrame = {
    val p = col(payloadCol)
    def prefix(n: Int) = hex(substring(p, 1, n))
    val mime =
      when(prefix(2) === "1F8B", "application/gzip")
        .when(prefix(4) === "89504E47", "image/png")
        .when(prefix(3) === "FFD8FF", "image/jpeg")
        .when(prefix(4) === "25504446", "application/pdf")
        .when(prefix(4) === "504B0304", "application/zip")
        .when(prefix(4) === "52494646", "audio/wav") // RIFF container
        .when(substring(p, 1, 1).cast("string").isin("{", "["), "application/json")
        .when(substring(p, 1, 1).cast("string") === "<", "application/xml")
        .when(length(regexp_replace(substring(p, 1, 64).cast("string"),
                                    "[\\x09\\x0A\\x0D\\x20-\\x7E]", "")) === 0, "text/plain")
        .otherwise("application/octet-stream")
    df.withColumn(outCol, mime)
  }

  /** XML record reader (NiFi XMLReader): parse an XML string column with
    * a schema and flatten its top-level fields. Narrow. */
  def parseXml(df: DataFrame, xmlCol: String, schema: org.apache.spark.sql.types.StructType,
               prefix: String = ""): DataFrame = {
    val parsed = df.withColumn("__x", from_xml(col(xmlCol), lit(schema.toDDL)))
    schema.fieldNames.foldLeft(parsed) { (d, f) =>
      d.withColumn(prefix + f, col("__x").getField(f))
    }.drop("__x")
  }

  /** EvaluateXPath (NiFi): extract one string value per XPath expression
    * into a new column, in the GIVEN order (flow definitions rely on
    * property order for output column order). Spark-native xpath
    * expressions — narrow, no UDF. */
  def evaluateXPath(df: DataFrame, xmlCol: String, paths: Seq[(String, String)]): DataFrame =
    paths.foldLeft(df) { case (d, (name, p)) =>
      d.withColumn(name, xpath_string(col(xmlCol), lit(p)))
    }

  def evaluateXPath(df: DataFrame, xmlCol: String, paths: Map[String, String]): DataFrame =
    evaluateXPath(df, xmlCol, paths.toSeq)

  /** SplitXml (NiFi): one output row per node matched by `path` (its
    * text content). `path` must end in text() or select text nodes. */
  def splitXml(df: DataFrame, xmlCol: String, path: String,
               outCol: String = "fragment"): DataFrame =
    df.withColumn(outCol, explode(xpath(col(xmlCol), lit(path))))

  /** CountText: per-record line / word / character metrics (NiFi
    * CountText emits these as attributes). Narrow, codegen'd. */
  def countText(df: DataFrame, contentCol: String): DataFrame = {
    val c = col(contentCol)
    df.withColumn("n_lines",
        size(org.apache.spark.sql.functions.split(c, "\n", -1)).cast("long"))
      .withColumn("n_words",
        size(filter(org.apache.spark.sql.functions.split(c, "\\s+"),
                    t => length(t) > 0)).cast("long"))
      .withColumn("n_chars", length(c).cast("long"))
  }

  /** EncodeContent (encode mode): base64 or hex encoding of a payload
    * column. Narrow. */
  def encodeContent(df: DataFrame, contentCol: String, encoding: String,
                    outCol: String = "encoded"): DataFrame = {
    val payload = col(contentCol).cast("binary")
    val enc = encoding.toLowerCase match {
      case "base64" => base64(payload)
      case "hex"    => hex(payload)
      case "base32" => graft.plans.BinaryExpressions.base32(payload)
      case other    => throw new IllegalArgumentException(
        s"unsupported encoding '$other' (base64|hex|base32)")
    }
    df.withColumn(outCol, enc)
  }

  /** EncodeContent (decode mode): inverse of [[encodeContent]]; output
    * is binary. Narrow. */
  def decodeContent(df: DataFrame, contentCol: String, encoding: String,
                    outCol: String = "decoded"): DataFrame = {
    val dec = encoding.toLowerCase match {
      case "base64" => unbase64(col(contentCol))
      case "hex"    => unhex(col(contentCol))
      case "base32" => graft.plans.BinaryExpressions.unbase32(col(contentCol))
      case other    => throw new IllegalArgumentException(
        s"unsupported encoding '$other' (base64|hex|base32)")
    }
    df.withColumn(outCol, dec)
  }

  /** ReplaceTextWithMapping: literal find→replace pairs applied in the
    * given order (NiFi applies its mapping file sequentially; ordering
    * matters when keys overlap — document the mapping accordingly).
    * Narrow, codegen'd. */
  def replaceWithMapping(df: DataFrame, contentCol: String,
                         mapping: Seq[(String, String)],
                         outCol: String = null): DataFrame = {
    val out = mapping.foldLeft(col(contentCol)) { case (c, (from, to)) =>
      replace(c, lit(from), lit(to))
    }
    df.withColumn(if (outCol == null) contentCol else outCol, out)
  }

  /** RouteText: split content into lines and route each line by the
    * first matching regex (NiFi RouteText line-oriented routing).
    * Output: original columns + (line_no, line, route). Narrow —
    * the explode multiplies rows but nothing shuffles. */
  def routeText(df: DataFrame, contentCol: String,
                routes: Seq[(String, String)],
                unmatched: String = "unmatched",
                routeCol: String = "route"): DataFrame = {
    val lines = df.select(col("*"),
      posexplode(org.apache.spark.sql.functions.split(col(contentCol), "\n", -1))
        .as(Seq("line_no", "line")))
    val route = routes.foldRight(lit(unmatched): Column) {
      case ((name, pattern), alt) => when(col("line").rlike(pattern), lit(name)).otherwise(alt)
    }
    lines.withColumn(routeCol, route)
  }

  /** SplitJson: explode a JSON-array column into one row per element
    * (NiFi SplitJson with a root array path). Elements surface as raw
    * JSON strings (`elemCol`) with their array position — feed
    * [[jsonPath]] / `from_json` downstream for typed access. Narrow. */
  def splitJson(df: DataFrame, jsonCol: String,
                posCol: String = "pos", elemCol: String = "element"): DataFrame =
    df.select(col("*"),
      posexplode(from_json(col(jsonCol),
        org.apache.spark.sql.types.ArrayType(org.apache.spark.sql.types.StringType)))
        .as(Seq(posCol, elemCol)))

  /** PackageFlowFile / MergeContent(defragment): bundle each group's
    * rows into ONE row holding an ordered array of payload structs.
    * One shuffle on the group key; the array order is deterministic
    * (array_sort on the leading order column) without a global sort. */
  def pack(df: DataFrame, groupCols: Seq[String], orderCol: String,
           payloadCols: Seq[String], packedCol: String = "packed"): DataFrame = {
    val fields = (orderCol +: payloadCols.filterNot(_ == orderCol)).map(c => col(c).as(c))
    df.groupBy(groupCols.map(col): _*)
      .agg(array_sort(collect_list(struct(fields: _*))).as(packedCol))
  }

  /** UnpackContent: explode a packed array back to one row per element
    * (`frag_idx` = position within the package), flattening the struct
    * fields. Exact inverse of [[pack]]. Narrow. */
  def unpack(df: DataFrame, packedCol: String,
             fragCol: String = "frag_idx"): DataFrame = {
    val elemFields = df.schema(packedCol).dataType
      .asInstanceOf[org.apache.spark.sql.types.ArrayType]
      .elementType.asInstanceOf[org.apache.spark.sql.types.StructType]
      .fieldNames
    val exploded = df.select(col("*"),
        posexplode(col(packedCol)).as(Seq(fragCol, "__elem")))
      .drop(packedCol)
    elemFields.foldLeft(exploded) { (d, f) =>
      d.withColumn(f, col(s"__elem.$f"))
    }.drop("__elem")
  }

  /** ForkRecord (NiFi): fork one record per element of a nested
    * array-of-records column, flattening the element's fields to the
    * top level and carrying the listed parent fields onto every forked
    * record (NiFi's "Include Parent Fields"). Parent fields win name
    * collisions (the element's field is suffixed `_forked`), matching
    * NiFi's parent-precedence. Narrow — posexplode multiplies rows but
    * nothing shuffles. */
  def forkRecord(df: DataFrame, arrayCol: String, parentCols: Seq[String],
                 idxCol: String = "fork_idx"): DataFrame = {
    val elemFields = df.schema(arrayCol).dataType
      .asInstanceOf[org.apache.spark.sql.types.ArrayType]
      .elementType.asInstanceOf[org.apache.spark.sql.types.StructType]
      .fieldNames
    val exploded = df.select(parentCols.map(col) :+
      posexplode(col(arrayCol)).as(Seq(idxCol, "__rec")): _*)
    elemFields.foldLeft(exploded) { (d, f) =>
      val out = if (parentCols.contains(f) || f == idxCol) f + "_forked" else f
      d.withColumn(out, col(s"__rec.$f"))
    }.drop("__rec")
  }

  /** SplitAvro (NiFi): one row per `outputSize`-record chunk of the
    * Avro object-container payload in `contentCol` — split_idx /
    * record_count / split_data (a complete container per chunk, or
    * bare binary-encoded records; see [[graft.plans.AvroSplit]] for
    * the determinism + metadata-transfer contract). Narrow: the
    * per-record loop runs inside one native expression, rows explode
    * in place. explode_outer keeps MALFORMED payloads as one row with
    * null split columns — route on `split_data IS NULL` for NiFi's
    * failure relationship instead of losing the evidence. */
  def splitAvro(df: DataFrame, contentCol: String, outputSize: Int = 1,
                bare: Boolean = false): DataFrame =
    df.withColumn("__s", explode_outer(graft.plans.AvroExpressions.avroSplit(
        col(contentCol).cast("binary"), outputSize, bare)))
      .withColumn("split_idx", col("__s.split_idx"))
      .withColumn("record_count", col("__s.record_count"))
      .withColumn("split_data", col("__s.split_data"))
      .drop("__s")

  /** ConvertExcelToCSV (NiFi): one row per extracted sheet of the XLSX
    * payload in `contentCol` — `sheet` name + RFC-4180 `csv` text (see
    * [[graft.plans.ExcelToCsv]] for the ECMA-376 parsing contract:
    * JDK-only zip+StAX, shared strings, verbatim numeric serials,
    * XXE-hardened). Narrow; explode_outer keeps malformed payloads as
    * one row with null sheet columns — route on `csv IS NULL` for
    * NiFi's failure relationship. */
  def excelToCsv(df: DataFrame, contentCol: String, sheets: Seq[String] = Nil,
                 skipRows: Int = 0, skipCols: Seq[Int] = Nil): DataFrame =
    df.withColumn("__x", explode_outer(graft.plans.ExcelExpressions.excelToCsv(
        col(contentCol).cast("binary"), sheets, skipRows, skipCols)))
      .withColumn("sheet", col("__x.sheet"))
      .withColumn("csv", col("__x.csv"))
      .drop("__x")

  /** UnpackContent, zip mode (NiFi): one row per archived file —
    * (original columns, entry_name, entry_data). Directory entries are
    * skipped; archives explode in place with no driver involvement.
    * Narrow (per-record inflate loop inside one native expression). */
  def unpackZip(df: DataFrame, contentCol: String): DataFrame =
    df.withColumn("__e",
        explode(graft.plans.BinaryExpressions.zipEntries(col(contentCol).cast("binary"))))
      .withColumn("entry_name", col("__e.name"))
      .withColumn("entry_data", col("__e.data"))
      .drop("__e")

  /** MergeContent, ARCHIVE formats (r15 — NiFi's Merge Format
    * zip/tar): bundle each group's (name, data) rows into ONE archive
    * payload. One shuffle on the group key; entries are ordered by
    * `orderCol` inside the group (array_sort on the leading struct
    * field — no global sort), and the archive bytes are DETERMINISTIC
    * (epoch-0 timestamps in both formats), so re-merges are
    * byte-identical. Output: group columns + `archive` binary. */
  def mergeArchive(df: DataFrame, groupCols: Seq[String], orderCol: String,
                   nameCol: String, dataCol: String, format: String,
                   archiveCol: String = "archive"): DataFrame = {
    val packer: Column => Column = format.toLowerCase match {
      case "zip" => graft.plans.BinaryExpressions.zipPack
      case "tar" => graft.plans.BinaryExpressions.tarPack
      case f     => throw new IllegalArgumentException(s"mergeArchive: unknown format '$f'")
    }
    val sorted = df.groupBy(groupCols.map(col): _*)
      .agg(array_sort(collect_list(struct(col(orderCol).as("o"),
        col(nameCol).cast("string").as("name"),
        col(dataCol).cast("binary").as("data")))).as("__entries"))
    sorted.withColumn(archiveCol,
        packer(transform(col("__entries"),
          e => struct(e.getField("name").as("name"), e.getField("data").as("data")))))
      .drop("__entries")
  }

  /** UnpackContent, archive forms (r15): one row per archived file
    * with NiFi's fragment-attribute contract — `fragment_index` (the
    * entry's position in its archive), `fragment_count` (entries in
    * that archive), and the parent row's columns carried through (the
    * `fragment.identifier` analog: the parent's own id column(s)
    * remain on every fragment). Zip and tar payloads both unpack
    * through one native expression; narrow. */
  def unpackArchive(df: DataFrame, contentCol: String, format: String): DataFrame = {
    val splitter: Column => Column = format.toLowerCase match {
      case "zip" => graft.plans.BinaryExpressions.zipEntries
      case "tar" => graft.plans.BinaryExpressions.tarEntries
      case f     => throw new IllegalArgumentException(s"unpackArchive: unknown format '$f'")
    }
    df.withColumn("__entries", splitter(col(contentCol).cast("binary")))
      .withColumn("fragment_count", size(col("__entries")).cast("long"))
      .select(col("*"), posexplode(col("__entries")).as(Seq("fragment_index", "__e")))
      .withColumn("entry_name", col("__e.name"))
      .withColumn("entry_data", col("__e.data"))
      .withColumn("fragment_index", col("fragment_index").cast("long"))
      .drop("__entries", "__e")
  }

  /** UpdateRecord (NiFi): SET a field by record path — a top-level
    * column ("name") or a nested struct field ("name.sub.leaf",
    * arbitrary depth via Column.withField), leaving sibling fields
    * intact. Also creates the field when absent (withField semantics).
    * Narrow. */
  def updateField(df: DataFrame, path: String, value: Column): DataFrame =
    path.split("\\.", 2) match {
      case Array(top)      => df.withColumn(top, value)
      case Array(top, sub) => df.withColumn(top, col(top).withField(sub, value))
    }

  /** RemoveRecordField: drop a top-level column ("name") or a struct
    * field ("name.sub", arbitrary depth via Column.dropFields). Narrow. */
  def removeField(df: DataFrame, path: String): DataFrame =
    path.split("\\.", 2) match {
      case Array(top)      => df.drop(top)
      case Array(top, sub) => df.withColumn(top, col(top).dropFields(sub))
    }

  /** RenameRecordField: rename a top-level column or a struct field
    * (one level of nesting; the renamed field is appended after the
    * struct's remaining fields, matching withField semantics). */
  def renameField(df: DataFrame, path: String, to: String): DataFrame =
    path.split("\\.", 2) match {
      case Array(top)      => df.withColumnRenamed(top, to)
      case Array(top, sub) =>
        df.withColumn(top, col(top).withField(to, col(s"$top.$sub")).dropFields(sub))
    }
}
