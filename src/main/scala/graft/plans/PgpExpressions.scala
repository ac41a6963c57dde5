package graft.plans

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types.{BinaryType, DataType}

/** EncryptContentPGP as a native expression ([[graft.operators.Pgp]]
  * does the RFC 4880 work): the expensive iterated S2K runs ONCE per
  * task via the instance-lazy key — per row only AES-CFB + two SHA
  * passes remain. Deterministic (see the Pgp scaladoc), so Spark may
  * collapse/replay it freely. */
case class PgpEncrypt(child: Expression, passphrase: String, armored: Boolean)
    extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = BinaryType
  override def prettyName: String = "graft_pgp_encrypt"

  @transient private lazy val pass = passphrase.getBytes("UTF-8")
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
  * exceptions for direct callers. */
case class PgpDecrypt(child: Expression, passphrase: String)
    extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = BinaryType
  override def nullable: Boolean = true
  override def prettyName: String = "graft_pgp_decrypt"

  override protected def nullSafeEval(input: Any): Any =
    try graft.operators.Pgp.decryptSym(input.asInstanceOf[Array[Byte]], passphrase)
    catch { case _: RuntimeException | _: java.io.IOException => null }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
