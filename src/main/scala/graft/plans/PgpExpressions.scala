package graft.plans

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types.{BinaryType, DataType}

/** Sensitive-value holder for expression fields (r16, ADVICE): Catalyst
  * renders expression arguments via `productIterator` in explain()
  * output, the Spark UI SQL tab, and event logs — a raw String
  * passphrase field would be published verbatim in all three, which is
  * exactly the leak NiFi's "sensitive property" flag exists to prevent.
  * Equality stays value-based (two plans under different passphrases
  * must never canonicalize to the same expression); only the rendered
  * form is redacted. */
final case class Secret(value: String) {
  override def toString: String = "*****"
}

/** EncryptContentPGP as a native expression ([[graft.operators.Pgp]]
  * does the RFC 4880 work): the expensive iterated S2K runs ONCE per
  * task via the instance-lazy key — per row only AES-CFB + two SHA
  * passes remain. Deterministic (see the Pgp scaladoc), so Spark may
  * collapse/replay it freely. */
case class PgpEncrypt(child: Expression, passphrase: Secret, armored: Boolean)
    extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = BinaryType
  override def prettyName: String = "graft_pgp_encrypt"

  @transient private lazy val pass = passphrase.value.getBytes("UTF-8")
  @transient private lazy val salt = graft.operators.Pgp.sessionSalt(pass)
  @transient private lazy val key = graft.operators.Pgp.sessionKey(pass, salt)

  override protected def nullSafeEval(input: Any): Any =
    graft.operators.Pgp.encryptWith(input.asInstanceOf[Array[Byte]],
      pass, salt, key, fileName = "", armored = armored)

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** DecryptContentPGP: malformed messages, wrong passphrases, MDC
  * tamper and unsupported algorithms all yield NULL (route on it —
  * NiFi's failure relationship) instead of failing the task; the
  * reason strings live in the [[graft.operators.Pgp.decryptSym]]
  * exceptions for direct callers. The per-task S2K memo (r16, ADVICE)
  * keys on the full S2K parameter tuple, so a column of graft- or
  * gpg-produced messages sharing one SKESK derives the ~24 MB
  * iterated hash once per task instead of once per row. */
case class PgpDecrypt(child: Expression, passphrase: Secret)
    extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = BinaryType
  override def nullable: Boolean = true
  override def prettyName: String = "graft_pgp_decrypt"

  @transient private lazy val s2kMemo =
    scala.collection.concurrent.TrieMap.empty[(Int, String, Long, Int), Array[Byte]]

  override protected def nullSafeEval(input: Any): Any =
    try graft.operators.Pgp.decryptSym(input.asInstanceOf[Array[Byte]],
      passphrase.value, s2kMemo)
    catch { case _: RuntimeException | _: java.io.IOException => null }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
