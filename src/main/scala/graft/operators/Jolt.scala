package graft.operators

import scala.jdk.CollectionConverters._

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import com.fasterxml.jackson.databind.node.{ArrayNode, JsonNodeFactory, ObjectNode, TextNode}

/** Jolt JSON-to-JSON transform DSL — the full chained form of NiFi's
  * JoltTransformJSON processor (the [[Records.joltTransform]] Column
  * tree stays as the codegen'd fast path for static shift+default
  * specs; THIS interpreter handles the data-dependent grammar a static
  * expression tree cannot: `*` wildcards match keys only known at
  * runtime, `&` substitutes them back).
  *
  * Implemented from the public Jolt documentation and its worked
  * examples (github.com/bazaarvoice/jolt — shift/default/remove/
  * cardinality/modify-overwrite-beta, chained as
  * `[{"operation": ..., "spec": ...}, ...]`):
  *
  *  - **shift**: spec tree walked against the input tree. LHS keys
  *    match literally first, then `a|b` alternation, then `*`; array
  *    elements match via their index as a key. RHS is a destination
  *    path (dotted; `&`/`&0`/`&(1)` substitute the key matched 0/1/…
  *    levels up; a trailing `[]` segment appends to an array), a
  *    nested spec object, or an array of destination paths
  *    (multi-write). `$`/`$n`/`$(n)` LHS entries write the MATCHED KEY
  *    n levels up as the value (the docs' "collect the keys" example);
  *    `#literal` LHS entries write the literal when the spec level is
  *    reached. `@`/`@n`/`@(n)`/`@(n,path)`/`@(path)` LHS entries
  *    (r18) copy the looked-up input VALUE — the whole node at the
  *    current match level for `@`, or `path` read from the node n
  *    levels up — and the same forms inside an RHS destination key
  *    the OUTPUT by a data value (the docs' "photos.@(1,type).id"); a
  *    missing lookup skips that write. Two writes to one slot
  *    accumulate into an array (Jolt's list-on-collision rule).
  *    Unmatched input is dropped.
  *  - **default**: literals applied where the slot is absent or null;
  *    `*` applies under every existing key; nested spec objects create
  *    missing containers.
  *  - **remove**: LHS grammar as shift; a leaf `""` removes the
  *    matched slot.
  *  - **cardinality**: leaf `"ONE"` unwraps a list to its first
  *    element, `"MANY"` wraps a non-list into a one-element list.
  *  - **modify-overwrite-beta**: argless leaves `=toUpper|=toLower|
  *    =trim|=size|=toInteger|=toDouble|=toString` apply to the
  *    existing value (absent slots stay absent); function leaves
  *    `=concat(...)`/`=join(delim, arr)`/`=split(regex, str)` plus the
  *    docs' MATH vocabulary (r18: `=min/=max/=abs/=avg`, typed
  *    `=intSum/=longSum/=doubleSum` and `=intSubtract/=longSubtract/
  *    =doubleSubtract`, `=divide`/`=divideAndRound(digits, a, b)`) and
  *    list accessors (`=firstElement/=lastElement/=elementAt(list, i)`)
  *    compute from arguments — quoted literals, numbers, list
  *    flattening for the aggregate forms, and `@(n,field)` references
  *    (n = 1 the enclosing object's sibling, n = 2 one object level up,
  *    …; r18 closed the depth bound) — and CREATE the slot (skipped
  *    when a referenced field is absent, the level is past the root, a
  *    divisor is zero, or no operand is numeric — Jolt's
  *    empty-Optional behavior); any other leaf literal overwrites; `*`
  *    matches every key; recursion only descends into slots that
  *    exist.
  *
  * Documented subset bounds: `&(n,k)` group references are not
  * implemented (this engine's wildcards are whole-key, so there is no
  * group to reference — N/A by design; r18 closed the math functions
  * and the modify @-depth bound); the spec parser rejects nothing
  * silently — unknown
  * operations, malformed function leaves and out-of-depth
  * `$n`/`&n`/`@n` references throw at parse time; data-DEPENDENT
  * transform failures route the row to the failure relationship
  * (null) instead of failing the job.
  *
  * Reference behavior: NiFi standard-bundle JoltTransformJSON
  * (chained DSL, spec validated at processor-config time).
  */
object Jolt {

  private val mapper = new ObjectMapper()
  private val f = JsonNodeFactory.instance

  /** Parse + validate a chained spec (or a single shift spec object,
    * accepted as a one-element chain for convenience). Returns the
    * transform. Throws on unknown operations or malformed spec — call
    * once at flow-compile/processor-validation time. */
  def chain(specJson: String): JsonNode => JsonNode = {
    val spec = mapper.readTree(specJson)
    val steps: Seq[(String, JsonNode)] =
      if (spec.isArray) spec.elements().asScala.toSeq.map { entry =>
        require(entry.isObject && entry.has("operation") && entry.has("spec"),
          "jolt chain entries need {\"operation\": ..., \"spec\": ...}")
        (entry.get("operation").asText(), entry.get("spec"))
      }
      else Seq(("shift", spec)) // bare object = a single shift spec
    val fns = steps.map {
      case ("shift", s)       => require(s.isObject, "shift spec must be an object")
                                 validateShift(s.asInstanceOf[ObjectNode], 0)
                                 (in: JsonNode) => shift(in, s.asInstanceOf[ObjectNode])
      case ("default", s)     => require(s.isObject, "default spec must be an object")
                                 (in: JsonNode) => defaults(in, s.asInstanceOf[ObjectNode])
      case ("remove", s)      => require(s.isObject, "remove spec must be an object")
                                 (in: JsonNode) => remove(in, s.asInstanceOf[ObjectNode])
      case ("cardinality", s) => require(s.isObject, "cardinality spec must be an object")
                                 validateLeaves(s, "cardinality") {
                                   t => t.isTextual && Set("ONE", "MANY")(t.asText()) }
                                 (in: JsonNode) => cardinality(in, s.asInstanceOf[ObjectNode])
      case ("modify-overwrite-beta", s) =>
        require(s.isObject, "modify spec must be an object")
        validateLeaves(s, "modify-overwrite-beta") { t =>
          if (!(t.isTextual && t.asText().startsWith("="))) true
          else if (ArglessFns(t.asText())) true
          else { parseModifyFn(t.asText()); true } // throws on a bad fn leaf
        }
        (in: JsonNode) => modify(in, s.asInstanceOf[ObjectNode])
      case (op, _) => throw new IllegalArgumentException(
        s"jolt: unsupported operation '$op' " +
        "(shift|default|remove|cardinality|modify-overwrite-beta)")
    }
    (in: JsonNode) => fns.foldLeft(in)((node, fn) => fn(node))
  }

  /** Spec leaves are data-independent — reject a bad one at parse time
    * (NiFi's processor-validation moment), never per row. */
  private def validateLeaves(spec: JsonNode, op: String)(ok: JsonNode => Boolean): Unit =
    spec.properties().asScala.foreach { e =>
      e.getValue match {
        case o: ObjectNode => validateLeaves(o, op)(ok)
        case leaf => require(ok(leaf), s"jolt $op: unsupported leaf $leaf")
      }
    }

  /** One-call convenience: transform a JSON string. Null/unparseable
    * INPUT yields null (the failure relationship); spec errors were
    * already rejected by [[chain]]. Data-DEPENDENT transform failures
    * (e.g. a shift multi-write colliding with a scalar already at the
    * destination, which [[write]] raises per row) also yield null —
    * NiFi's JoltTransformJSON routes that FlowFile to `failure`
    * instead of failing the whole run, and one unusual document must
    * not kill a 100 TB job. Spec validation stays strict in [[chain]]
    * (those errors fire before any row is seen). */
  /** Per-JVM compiled-transform cache (r19): each task deserializes
    * its own JoltTransform expression, whose lazy compile re-parsed
    * and re-validated the spec once per TASK ATTEMPT. Compiled chains
    * are pure functions over read-only spec nodes (and the shared
    * ObjectMapper is thread-safe), so one JVM-wide instance per spec
    * string is safe across tasks and threads — at cluster scale the
    * spec compiles once per EXECUTOR, not once per task. Bounded by
    * the number of distinct specs a JVM ever runs (flow-config-sized). */
  private val compiledCache =
    new java.util.concurrent.ConcurrentHashMap[String, String => String]()
  def transformStringCached(specJson: String): String => String =
    compiledCache.computeIfAbsent(specJson, transformString(_))

  def transformString(specJson: String): String => String = {
    val t = chain(specJson)
    (json: String) =>
      if (json == null) null
      else {
        val root = try mapper.readTree(json)
                   catch { case _: com.fasterxml.jackson.core.JacksonException => null }
        if (root == null) null
        else try mapper.writeValueAsString(t(root))
             catch { case _: IllegalArgumentException => null }
      }
  }

  // ------------------------------------------------------------- shift

  /** LHS match order per the Jolt docs: literal beats alternation
    * beats `*`. Returns the spec value to walk with. */
  private def lhsMatch(spec: ObjectNode, key: String): Option[JsonNode] = {
    // $/#/@ spec entries are level-triggered writes, not key matchers —
    // an input key that happens to start with $/#/@ may still match `*`
    if (spec.has(key) && !key.startsWith("$") && !key.startsWith("#")
        && !key.startsWith("@"))
      return Some(spec.get(key))
    val alt = spec.properties().asScala
      .find { e => val k = e.getKey
        k.contains('|') && k.split('|').contains(key) }
      .map(_.getValue)
    alt.orElse(Option(spec.get("*")))
  }

  private def shift(input: JsonNode, spec: ObjectNode): JsonNode = {
    val out = f.objectNode()
    walkShift(input, spec, Nil, List(input), out)
    out
  }

  /** Write `value` at every destination the (textual or array-of-text)
    * RHS names — the shared tail of key matches, `$` key-refs, `#`
    * literals and `@` value-lookups. `nodes` is the input-node stack
    * (head = the node at the current match level) for RHS `@(n,path)`
    * destination segments. */
  private def writeDst(out: ObjectNode, rhs: JsonNode, value: JsonNode,
                       matched: List[String], nodes: List[JsonNode],
                       ctx: String): Unit = rhs match {
    case t if t.isTextual =>
      resolveDst(t.asText(), matched, nodes).foreach(write(out, _, value))
    case a: ArrayNode =>
      a.elements().asScala.foreach { d =>
        require(d.isTextual, s"jolt shift: destination array must hold path strings ($ctx)")
        resolveDst(d.asText(), matched, nodes).foreach(write(out, _, value))
      }
    case other => throw new IllegalArgumentException(
      s"jolt shift: unsupported RHS ${other.getNodeType} for $ctx")
  }

  private val DollarKey = "\\$(?:\\((\\d+)\\)|(\\d+))?".r

  // `@`, `@n`, `@(n)`, `@(n,path)`, `@(path)` — the Jolt docs' value
  // lookups. As a spec KEY: copy the looked-up input VALUE (where $
  // copies the matched KEY). Inside a destination path: key the output
  // by a data value ("photos.@(1,type).id").
  private val AtRef = "@(?:\\(([^)]*)\\)|(\\d+))?".r

  /** (level, dotted-path) of one `@` reference. Throws on a malformed
    * form — spec validation, called at chain() time too. */
  private def parseAt(ref: String): (Int, String) = {
    ref match {
      case AtRef(paren, bare) =>
        if (paren != null) {
          val comma = paren.indexOf(',')
          if (comma > 0 && paren.take(comma).forall(_.isDigit))
            (paren.take(comma).toInt, paren.substring(comma + 1).trim)
          else if (paren.nonEmpty && paren.forall(_.isDigit)) (paren.toInt, "")
          else if (paren.nonEmpty) (0, paren.trim)
          else throw new IllegalArgumentException(
            s"jolt shift: malformed @-reference '$ref' (@, @n, @(n), @(n,path), @(path))")
        }
        else if (bare != null) (bare.toInt, "")
        else (0, "")
      case _ => throw new IllegalArgumentException(
        s"jolt shift: malformed @-reference '$ref'")
    }
  }

  /** Resolve an `@` lookup against the input-node stack: go up `lvl`
    * match levels, then walk the dotted path. None on a missing path
    * or level — a data-dependent miss; the write skips (Jolt treats an
    * unmatched lookup as no output, not an error). */
  private def atLookup(lvl: Int, path: String, nodes: List[JsonNode]): Option[JsonNode] = {
    if (lvl >= nodes.length) return None // statically prevented; backstop
    var cur: JsonNode = nodes(lvl)
    if (path.nonEmpty)
      for (seg <- path.split('.'))
        cur = if (cur == null) null else cur.get(seg)
    Option(cur).filterNot(_.isMissingNode)
  }

  /** Static shift-spec validation (chain/parse time). `$n` and `&n`
    * depth references are data-INdependent — the match depth at any
    * spec node IS its nesting level — so an out-of-range reference is
    * a SPEC error that must reject at processor-validation time, while
    * transform-time failures stay data-dependent (per-row → failure
    * relationship). `depth` = number of key-match levels above this
    * spec object (root = 0). */
  private def validateShift(spec: ObjectNode, depth: Int): Unit = {
    val amp = "&(?:\\((\\d+)\\)|(\\d+))?".r
    def dstOk(rhs: JsonNode, avail: Int, ctx: String): Unit = rhs match {
      case t if t.isTextual =>
        amp.findAllMatchIn(t.asText()).foreach { m =>
          val n = Option(m.group(1)).orElse(Option(m.group(2))).map(_.toInt).getOrElse(0)
          require(n < avail, s"jolt shift: &$n exceeds match depth $avail ($ctx)")
        }
        // @-refs in a destination see one more node level than & sees
        // match keys (the stack includes the root)
        AtRef.findAllMatchIn(t.asText()).foreach { m =>
          val (lvl, _) = parseAt(m.matched)
          require(lvl <= avail, s"jolt shift: @$lvl exceeds match depth $avail ($ctx)")
        }
      case a: ArrayNode => a.elements().asScala.foreach(dstOk(_, avail, ctx))
      case _ => () // non-path RHS shapes reject in writeDst's walk below
    }
    spec.properties().asScala.foreach { e =>
      e.getKey match {
        case k @ DollarKey(par, bare) if k.startsWith("$") =>
          val n = Option(par).orElse(Option(bare)).map(_.toInt).getOrElse(0)
          require(n < depth, s"jolt shift: $k exceeds match depth $depth")
          dstOk(e.getValue, depth, k)
        case k if k.startsWith("#") && k.length > 1 => dstOk(e.getValue, depth, k)
        case k if k.startsWith("@") =>
          // the node stack at this level has depth+1 entries (root incl.)
          val (lvl, _) = parseAt(k) // throws on malformed form
          require(lvl <= depth, s"jolt shift: $k exceeds match depth $depth")
          dstOk(e.getValue, depth, k)
        case k if k.startsWith("$") || k == "#" => throw new IllegalArgumentException(
          s"jolt shift: malformed key-reference LHS '$k' ($$, $$n or $$(n))")
        case k => e.getValue match {
          case o: ObjectNode => validateShift(o, depth + 1)
          case rhs => dstOk(rhs, depth + 1, s"key '$k'")
        }
      }
    }
  }

  private def walkShift(node: JsonNode, spec: ObjectNode,
                        matched: List[String], nodes: List[JsonNode],
                        out: ObjectNode): Unit = {
    // $-, #- and @-entries fire when this spec LEVEL is reached (once
    // per matched node): `$n` writes the key matched n levels up as the
    // VALUE; `#literal` writes the literal; `@`/`@(n,path)` writes the
    // looked-up input VALUE. All use the normal RHS destination grammar.
    // `nodes` is the input-node stack, head = this level's node.
    spec.properties().asScala.foreach { e =>
      e.getKey match {
        case DollarKey(par, bare) if e.getKey.startsWith("$") =>
          val n = Option(par).orElse(Option(bare)).map(_.toInt).getOrElse(0)
          require(n < matched.length,
            s"jolt shift: ${e.getKey} exceeds match depth ${matched.length}")
          writeDst(out, e.getValue, new TextNode(matched(n)), matched, nodes, e.getKey)
        case k if k.startsWith("#") && k.length > 1 =>
          writeDst(out, e.getValue, new TextNode(k.substring(1)), matched, nodes, k)
        case k if k.startsWith("@") =>
          val (lvl, path) = parseAt(k)
          atLookup(lvl, path, nodes).foreach { v =>
            writeDst(out, e.getValue, v, matched, nodes, k)
          }
        case k if k.startsWith("$") || k == "#" => throw new IllegalArgumentException(
          s"jolt shift: malformed key-reference LHS '$k' ($$, $$n or $$(n))")
        case _ => ()
      }
    }
    def one(key: String, value: JsonNode): Unit =
      lhsMatch(spec, key).foreach { rhs =>
        val m2 = key :: matched
        val n2 = value :: nodes
        rhs match {
          case o: ObjectNode => walkShift(value, o, m2, n2, out)
          case other => writeDst(out, other, value, m2, n2, s"key '$key'")
        }
      }
    node match {
      case o: ObjectNode =>
        o.properties().asScala.foreach(e => one(e.getKey, e.getValue))
      case a: ArrayNode =>
        a.elements().asScala.zipWithIndex.foreach { case (v, i) => one(i.toString, v) }
      case _ => () // scalar at a spec-object level: nothing to match
    }
  }

  /** `&`, `&0`, `&(1)` and `@(n,path)` substitution inside one
    * destination path, then dot-split. A trailing `[]` on a segment
    * marks array-append. None when an `@` lookup misses or lands on a
    * non-scalar — that write skips (data-dependent, per the Jolt docs'
    * unmatched-lookup behavior). */
  private def resolveDst(dst: String, matched: List[String],
                         nodes: List[JsonNode]): Option[Seq[String]] = {
    val amp = "&(?:\\((\\d+)\\)|(\\d+))?".r
    val resolved = amp.replaceAllIn(dst, m => {
      val n = Option(m.group(1)).orElse(Option(m.group(2))).map(_.toInt).getOrElse(0)
      require(n < matched.length, s"jolt shift: &$n exceeds match depth in '$dst'")
      java.util.regex.Matcher.quoteReplacement(matched(n))
    })
    if (!resolved.contains('@'))
      return Some(resolved.split('.').toSeq)
    // destination keyed by input DATA: each @-ref becomes the looked-up
    // scalar's text ("photos.@(1,type).id" → photos.cat.id)
    val sb = new StringBuilder
    var last = 0
    for (m <- AtRef.findAllMatchIn(resolved)) {
      sb.append(resolved.substring(last, m.start))
      val (lvl, path) = parseAt(m.matched)
      atLookup(lvl, path, nodes) match {
        case Some(v) if v.isValueNode => sb.append(v.asText())
        case _ => return None
      }
      last = m.end
    }
    sb.append(resolved.substring(last))
    Some(sb.toString.split('.').toSeq)
  }

  /** Write `value` at the segment path; an existing value at the slot
    * converts to an array (Jolt multi-write); a `seg[]` tail appends. */
  private def write(root: ObjectNode, segs: Seq[String], value: JsonNode): Unit = {
    var cur = root
    for (s <- segs.dropRight(1)) {
      val name = s.stripSuffix("[]")
      cur = cur.get(name) match {
        case o: ObjectNode => o
        case null => val o = f.objectNode(); cur.set[JsonNode](name, o); o
        case other => throw new IllegalArgumentException(
          s"jolt shift: '$name' already holds a ${other.getNodeType}, cannot descend")
      }
    }
    val leaf = segs.last
    val v = value.deepCopy[JsonNode]()
    if (leaf.endsWith("[]")) {
      val name = leaf.stripSuffix("[]")
      val arr = cur.get(name) match {
        case a: ArrayNode => a
        case null => val a = f.arrayNode(); cur.set[JsonNode](name, a); a
        case other => val a = f.arrayNode(); a.add(other); cur.set[JsonNode](name, a); a
      }
      arr.add(v)
    } else cur.get(leaf) match {
      case null => cur.set[JsonNode](leaf, v)
      case a: ArrayNode => a.add(v)
      case prev => val a = f.arrayNode(); a.add(prev); a.add(v); cur.set[JsonNode](leaf, a)
    }
  }

  // ----------------------------------------------------------- default

  private def defaults(input: JsonNode, spec: ObjectNode): JsonNode = {
    val out = input.deepCopy[JsonNode]()
    applyDefaults(out, spec)
    out
  }

  private def applyDefaults(node: JsonNode, spec: ObjectNode): Unit = node match {
    case o: ObjectNode =>
      spec.properties().asScala.foreach { e =>
        val (key, sv) = (e.getKey, e.getValue)
        val targets =
          if (key == "*") o.properties().asScala.map(_.getKey).toSeq
          else Seq(key)
        targets.foreach { k =>
          sv match {
            case so: ObjectNode =>
              if (o.get(k) == null || o.get(k).isNull)
                { if (key != "*") o.set[JsonNode](k, f.objectNode()) } // create container for literal keys only
              o.get(k) match {
                case oo: ObjectNode => applyDefaults(oo, so)
                case _ => ()
              }
            case lit =>
              if (o.get(k) == null || o.get(k).isNull) o.set[JsonNode](k, lit.deepCopy[JsonNode]())
          }
        }
      }
    case a: ArrayNode => a.elements().asScala.foreach(applyDefaults(_, spec))
    case _ => ()
  }

  // ------------------------------------------------------------ remove

  private def remove(input: JsonNode, spec: ObjectNode): JsonNode = {
    val out = input.deepCopy[JsonNode]()
    applyRemove(out, spec)
    out
  }

  private def applyRemove(node: JsonNode, spec: ObjectNode): Unit = node match {
    case o: ObjectNode =>
      spec.properties().asScala.foreach { e =>
        val (key, sv) = (e.getKey, e.getValue)
        val targets =
          if (key == "*") o.properties().asScala.map(_.getKey).toSeq
          else if (key.contains('|')) key.split('|').toSeq.filter(k => o.has(k))
          else Seq(key).filter(o.has)
        targets.foreach { k =>
          sv match {
            case so: ObjectNode => Option(o.get(k)).foreach(applyRemove(_, so))
            case _ => o.remove(k) // leaf "" (any scalar) removes the slot
          }
        }
      }
    case a: ArrayNode => a.elements().asScala.foreach(applyRemove(_, spec))
    case _ => ()
  }

  // ------------------------------------------------------- cardinality

  private def cardinality(input: JsonNode, spec: ObjectNode): JsonNode = {
    val out = input.deepCopy[JsonNode]()
    applyCardinality(out, spec)
    out
  }

  private def applyCardinality(node: JsonNode, spec: ObjectNode): Unit = node match {
    case o: ObjectNode =>
      spec.properties().asScala.foreach { e =>
        val (key, sv) = (e.getKey, e.getValue)
        val targets =
          if (key == "*") o.properties().asScala.map(_.getKey).toSeq
          else Seq(key).filter(o.has)
        targets.foreach { k =>
          sv match {
            case so: ObjectNode => Option(o.get(k)).foreach(applyCardinality(_, so))
            case t if t.isTextual && t.asText() == "ONE" =>
              o.get(k) match {
                case a: ArrayNode =>
                  if (a.size() == 0) o.remove(k) else o.set[JsonNode](k, a.get(0))
                case _ => ()
              }
            case t if t.isTextual && t.asText() == "MANY" =>
              o.get(k) match {
                case _: ArrayNode => ()
                case v => val a = f.arrayNode(); a.add(v); o.set[JsonNode](k, a)
              }
            case other => throw new IllegalArgumentException(
              s"jolt cardinality: leaf must be ONE or MANY, got $other")
          }
        }
      }
    case a: ArrayNode => a.elements().asScala.foreach(applyCardinality(_, spec))
    case _ => ()
  }

  // ------------------------------------------- modify-overwrite-beta

  private def modify(input: JsonNode, spec: ObjectNode): JsonNode = {
    val out = input.deepCopy[JsonNode]()
    applyModify(out, spec, Nil)
    out
  }

  /** `ancestors` (r18): the chain of OBJECT nodes above `node`,
    * innermost first — `@(1,path)` resolves against the enclosing
    * object (head after push), `@(2,path)` one object level further
    * up, etc. Arrays are transparent (levels count object nesting —
    * the nearest enclosing objects). */
  private def applyModify(node: JsonNode, spec: ObjectNode,
                          ancestors: List[ObjectNode]): Unit = node match {
    case o: ObjectNode =>
      val stack = o :: ancestors
      spec.properties().asScala.foreach { e =>
        val (key, sv) = (e.getKey, e.getValue)
        val targets =
          if (key == "*") o.properties().asScala.map(_.getKey).toSeq
          else Seq(key)
        targets.foreach { k =>
          sv match {
            case so: ObjectNode => Option(o.get(k)).foreach(applyModify(_, so, stack))
            case t if t.isTextual && t.asText().startsWith("=") =>
              val txt = t.asText()
              if (ArglessFns(txt))
                Option(o.get(k)).foreach(v => o.set[JsonNode](k, arglessFn(txt, v)))
              else {
                // function-with-args computes from siblings/literals —
                // it CREATES the slot (Jolt's =concat on a new key);
                // an absent @(n,…) reference skips the assignment
                val (fn, args) = parseModifyFn(txt)
                evalModifyFn(fn, args, stack).foreach(r => o.set[JsonNode](k, r))
              }
            case lit => o.set[JsonNode](k, lit.deepCopy[JsonNode]()) // literal overwrite
          }
        }
      }
    case a: ArrayNode => a.elements().asScala.foreach(applyModify(_, spec, ancestors))
    case _ => ()
  }

  private val ArglessFns = Set("=toUpper", "=toLower", "=trim", "=size",
    "=toInteger", "=toDouble", "=toString")

  private def arglessFn(fn: String, v: JsonNode): JsonNode = fn match {
    case "=toUpper" => if (v.isTextual) new TextNode(v.asText().toUpperCase(java.util.Locale.ROOT)) else v
    case "=toLower" => if (v.isTextual) new TextNode(v.asText().toLowerCase(java.util.Locale.ROOT)) else v
    case "=trim"    => if (v.isTextual) new TextNode(v.asText().trim) else v
    case "=size"    =>
      if (v.isTextual) f.numberNode(v.asText().length)
      else if (v.isArray || v.isObject) f.numberNode(v.size())
      else v
    case "=toInteger" =>
      if (v.isIntegralNumber) v
      else if (v.isNumber) f.numberNode(v.asLong())
      else if (v.isTextual)
        try f.numberNode(v.asText().trim.toLong) catch { case _: NumberFormatException => v }
      else v
    case "=toDouble" =>
      if (v.isNumber) f.numberNode(v.asDouble())
      else if (v.isTextual)
        try f.numberNode(v.asText().trim.toDouble) catch { case _: NumberFormatException => v }
      else v
    case "=toString" =>
      if (v.isTextual) v
      else if (v.isValueNode) new TextNode(v.asText())
      else v
    case other => throw new IllegalArgumentException(
      s"jolt modify: unsupported function '$other' " +
      "(=toUpper|=toLower|=trim|=size|=toInteger|=toDouble|=toString)")
  }

  // --------------------------- modify function-with-args grammar

  private[operators] sealed trait MArg
  private case class MLit(v: JsonNode) extends MArg
  private case class MRef(level: Int, path: Seq[String]) extends MArg // @(n,path)

  // the function-with-args vocabulary: string builders + the docs'
  // MATH functions (r18 — min/max/abs/avg, typed sums and subtracts,
  // divide/divideAndRound) + list accessors
  private val ModifyFns: Set[String] = Set(
    "concat", "join", "split",
    "min", "max", "abs", "avg",
    "intSum", "longSum", "doubleSum",
    "intSubtract", "longSubtract", "doubleSubtract",
    "divide", "divideAndRound",
    "firstElement", "lastElement", "elementAt")

  /** Parse `=name(arg, ...)` — quoted literals ('x'), numbers,
    * true/false, and `@(1,dotted.path)` sibling references. Throws on
    * anything else, at spec-validation time. */
  private[operators] def parseModifyFn(s: String): (String, Seq[MArg]) = {
    val open = s.indexOf('(')
    require(s.startsWith("=") && open > 1 && s.endsWith(")"),
      s"jolt modify: malformed function leaf '$s'")
    val name = s.substring(1, open)
    require(ModifyFns(name),
      s"jolt modify: unsupported function '=$name' (${ModifyFns.toSeq.sorted.mkString("|")})")
    val body = s.substring(open + 1, s.length - 1)
    // split on top-level commas: quotes and @(...) parens guard commas
    val args = scala.collection.mutable.ArrayBuffer.empty[String]
    var depth = 0; var inQ = false; var start = 0
    var i = 0
    while (i < body.length) {
      body.charAt(i) match {
        case '\'' => inQ = !inQ
        case '(' if !inQ => depth += 1
        case ')' if !inQ => depth -= 1
        case ',' if !inQ && depth == 0 => args += body.substring(start, i); start = i + 1
        case _ => ()
      }
      i += 1
    }
    require(!inQ && depth == 0, s"jolt modify: unbalanced quotes/parens in '$s'")
    if (body.trim.nonEmpty) args += body.substring(start)
    val parsed = args.toSeq.map(_.trim).map { a =>
      if (a.startsWith("'") && a.endsWith("'") && a.length >= 2)
        MLit(new TextNode(a.substring(1, a.length - 1)))
      else if (a.startsWith("@(") && a.endsWith(")")) {
        val inner = a.substring(2, a.length - 1).split(",", 2)
        require(inner.length == 2 && inner(0).trim.matches("[1-9]\\d*"),
          s"jolt modify: @-reference needs @(n,field) with n >= 1, got '$a'")
        MRef(inner(0).trim.toInt, inner(1).trim.split('.').toSeq)
      }
      else if (a == "true") MLit(f.booleanNode(true))
      else if (a == "false") MLit(f.booleanNode(false))
      else if (a.matches("-?\\d+")) MLit(f.numberNode(a.toLong))
      else if (a.matches("-?\\d*\\.\\d+")) MLit(f.numberNode(a.toDouble))
      else throw new IllegalArgumentException(
        s"jolt modify: unsupported argument '$a' in '$s'")
    }
    (name, parsed)
  }

  /** Resolve args against the ancestor-object stack and evaluate
    * (head = the enclosing object, i.e. `@(1,…)`; `@(2,…)` is one
    * object level further up — r18, closing the depth bound). None
    * when a reference is absent or past the root (the assignment is
    * skipped, Jolt's empty-Optional behavior). */
  private def evalModifyFn(name: String, args: Seq[MArg],
                           stack: List[ObjectNode]): Option[JsonNode] = {
    def resolve(a: MArg): Option[JsonNode] = a match {
      case MLit(v) => Some(v)
      case MRef(level, path) =>
        path.foldLeft(stack.lift(level - 1).map(n => n: JsonNode)) {
          case (Some(n), seg) => Option(n.get(seg))
          case (None, _) => None
        }
    }
    val vals = args.map(resolve)
    if (vals.exists(_.isEmpty)) return None
    val vs = vals.map(_.get)
    def text(n: JsonNode): String = if (n.isTextual) n.asText() else n.toString
    name match {
      case "concat" => Some(new TextNode(vs.map(text).mkString))
      case "join" =>
        require(vs.length == 2, "jolt modify: =join(delim, array)")
        vs(1) match {
          case arr: ArrayNode =>
            Some(new TextNode(arr.elements().asScala.map(text).mkString(text(vs(0)))))
          case _ => None // non-array reference: nothing to join
        }
      case "split" =>
        require(vs.length == 2, "jolt modify: =split(regex, string)")
        if (!vs(1).isTextual) None
        else {
          val out = f.arrayNode()
          vs(1).asText().split(text(vs(0)), -1).foreach(p => out.add(new TextNode(p)))
          Some(out)
        }

      // ------------- math functions (r18, per the Jolt docs' Modifier
      // vocabulary). Operands: each arg contributes itself, or its
      // ELEMENTS when it is a list (the docs' "=intSum(@(1,values))"
      // form); numbers and numeric text convert, anything else makes
      // that operand vanish; zero usable operands → the assignment is
      // skipped (Jolt's empty-Optional behavior, not an error).
      case "min" | "max" =>
        val ops = numericOperands(vs)
        if (ops.isEmpty) None
        else {
          val d = if (name == "min") ops.map(_._1).min else ops.map(_._1).max
          Some(mkNum(d, ops.forall(_._2)))
        }
      case "abs" =>
        require(vs.length == 1, "jolt modify: =abs(x)")
        numericOperands(vs) match {
          case Seq((d, intish)) => Some(mkNum(math.abs(d), intish))
          case _ => None
        }
      case "avg" =>
        val ops = numericOperands(vs)
        if (ops.isEmpty) None
        else Some(f.numberNode(ops.map(_._1).sum / ops.length))
      case "intSum" | "longSum" | "doubleSum" =>
        // r19 (ADVICE): the typed integer forms sum in the LONG domain
        // when every operand is integral — upstream Jolt's
        // Math.intSum/longSum semantics — so longs past 2^53 keep
        // exact precision and int overflow wraps identically (mod-2^32
        // of the long sum equals per-add int wrapping). A double
        // operand anywhere falls the whole sum back to Double.
        val ops = numericOperands(vs)
        if (ops.isEmpty) None
        else if (name == "doubleSum") Some(f.numberNode(ops.map(_._1).sum))
        else longOperands(vs) match {
          case Some(ls) =>
            val s = ls.sum
            Some(if (name == "intSum") f.numberNode(s.toInt) else f.numberNode(s))
          case None =>
            val s = ops.map(_._1).sum
            Some(if (name == "intSum") f.numberNode(s.toInt) else f.numberNode(s.toLong))
        }
      case "intSubtract" | "longSubtract" | "doubleSubtract" =>
        require(vs.length == 2, s"jolt modify: =$name(a, b)")
        val longExact =
          if (name == "doubleSubtract") None
          else longOperands(vs) match {
            case Some(Seq(a, b)) => Some(a - b) // long-domain exact (r19, ADVICE)
            case _ => None
          }
        longExact match {
          case Some(d) =>
            Some(if (name == "intSubtract") f.numberNode(d.toInt) else f.numberNode(d))
          case None => numericOperands(vs) match {
            case Seq((a, _), (b, _)) =>
              val d = a - b
              Some(name match {
                case "intSubtract"  => f.numberNode(d.toInt)
                case "longSubtract" => f.numberNode(d.toLong)
                case _              => f.numberNode(d)
              })
            case _ => None
          }
        }
      case "divide" =>
        require(vs.length == 2, "jolt modify: =divide(a, b)")
        numericOperands(vs) match {
          case Seq((a, _), (b, _)) if b != 0.0 => Some(f.numberNode(a / b))
          case _ => None // divide by zero / non-numeric: skip, don't fail the row
        }
      case "divideAndRound" =>
        require(vs.length == 3, "jolt modify: =divideAndRound(digits, a, b)")
        numericOperands(vs) match {
          case Seq((dg, _), (a, _), (b, _)) if b != 0.0 && dg >= 0 =>
            val scale = math.pow(10, dg.toInt)
            Some(f.numberNode(math.round(a / b * scale) / scale))
          case _ => None
        }

      // ------------- list accessors
      case "firstElement" | "lastElement" =>
        require(vs.length == 1, s"jolt modify: =$name(list)")
        vs(0) match {
          case arr: ArrayNode if arr.size() > 0 =>
            Some(arr.get(if (name == "firstElement") 0 else arr.size() - 1))
          case _ => None
        }
      case "elementAt" =>
        require(vs.length == 2, "jolt modify: =elementAt(list, index)")
        (vs(0), vs(1)) match {
          case (arr: ArrayNode, idx) if idx.isNumber =>
            val i = idx.asInt()
            if (i >= 0 && i < arr.size()) Some(arr.get(i)) else None
          case _ => None
        }
      case other => throw new IllegalArgumentException(
        s"jolt modify: unsupported function '=$other'")
    }
  }

  /** (value, is-integral) operands for the math functions: args
    * flatten one list level; numbers and numeric TEXT convert. */
  private def numericOperands(vs: Seq[JsonNode]): Seq[(Double, Boolean)] =
    vs.flatMap {
      case a: ArrayNode => a.elements().asScala.toSeq
      case v => Seq(v)
    }.flatMap { n =>
      if (n.isNumber) Some((n.asDouble(), n.isIntegralNumber))
      else if (n.isTextual) {
        val t = n.asText()
        if (t.matches("-?\\d+")) Some((t.toDouble, true))
        else t.toDoubleOption.map((_, false))
      } else None
    }

  /** Long-domain operand view for the typed integer math forms (r19):
    * Some(longs) only when EVERY usable operand is integral and fits a
    * Long; None as soon as a double (or Long-overflowing digit-text)
    * operand appears, signalling the Double fallback. Mirrors
    * [[numericOperands]]' filtering — non-numeric operands vanish
    * rather than poisoning the call. */
  private def longOperands(vs: Seq[JsonNode]): Option[Seq[Long]] = {
    val flat: Seq[Option[Long]] = vs.flatMap {
      case a: ArrayNode => a.elements().asScala.toSeq
      case v => Seq(v)
    }.flatMap { n =>
      if (n.isNumber)
        Some(if (n.isIntegralNumber) Some(n.asLong()) else None)
      else if (n.isTextual) {
        val t = n.asText()
        if (t.matches("-?\\d+")) Some(t.toLongOption)
        else if (t.toDoubleOption.isDefined) Some(None)
        else None
      } else None
    }
    if (flat.exists(_.isEmpty)) None else Some(flat.flatten)
  }

  private def mkNum(d: Double, intish: Boolean): JsonNode =
    if (intish && d == math.rint(d) && math.abs(d) < 9.2e18) f.numberNode(d.toLong)
    else f.numberNode(d)
}
