package graft.sources

import org.apache.parquet.crypto.keytools.LocalWrapKmsClient

/** Demo KMS client for parquet MODULAR ENCRYPTION (the
  * `org.apache.parquet.crypto.keytools.KmsClient` seam a production
  * deployment points at Vault / AWS KMS / Cloud HSM): master keys are
  * derived deterministically from the key identifier, and
  * [[LocalWrapKmsClient]] does the envelope work — data keys are
  * generated per file by parquet, wrapped locally with the master key,
  * and stored wrapped in the file metadata, so the KMS only ever sees
  * master-key requests (the local-wrap mode real deployments use to
  * keep KMS call volume off the write path at 100 TB: one unwrap per
  * master key per task, never per file).
  *
  * Deterministic derivation keeps the fixture replayable; a real
  * client fetches the bytes from the KMS instead — everything else
  * (wrapping, caching, rotation hooks) is inherited unchanged. */
class InMemoryKms extends LocalWrapKmsClient {

  // nothing to connect to — key derivation is self-contained
  override protected def initializeInternal(): Unit = ()

  override protected def getMasterKeyFromServer(
      masterKeyIdentifier: String): Array[Byte] =
    java.security.MessageDigest.getInstance("SHA-256")
      .digest(s"graft-master-$masterKeyIdentifier".getBytes("UTF-8"))
      .take(16)
}
