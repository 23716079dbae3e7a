package graft.core

import org.apache.spark.sql.types._

/** The three Graph entity schemas — the engine's catalog (SURVEY.md §1.3).
  *
  * Source schemas describe the JSON as extracted (timestamps still ISO
  * strings, nested structs/arrays intact); sink schemas are the declared
  * relational targets (the reference's DDL: MD-SQL:7-40, CPC-SQL:7-29,
  * AUD-SQL:7-20). One StructType per entity is the single source of
  * truth driving source projection, transform output, and sink DDL —
  * the reference declares each three times (MD-PS:22, MD-PS:256-285,
  * MD-SQL:58-89) and keeps them in sync by hand.
  */
object EntitySchemas {

  private def s(n: String) = StructField(n, StringType)
  private def ts(n: String) = StructField(n, TimestampType)
  private def b(n: String) = StructField(n, BooleanType)

  // ------------------------------------------------------- ManagedDevices
  /** 25 $select properties (MD-PS:22) + operatingSystem (needed by the
    * engine-side filter when no server evaluates $filter) + 2 nested. */
  val managedDeviceSource: StructType = StructType(Seq(
    s("id"), s("userId"), s("deviceName"), s("managedDeviceOwnerType"),
    s("enrolledDateTime"), s("lastSyncDateTime"), s("operatingSystem"),
    s("complianceState"), s("managementAgent"), s("osVersion"),
    b("azureADRegistered"), s("deviceEnrollmentType"), s("emailAddress"),
    s("azureADDeviceId"), s("deviceRegistrationState"), b("isEncrypted"),
    s("userPrincipalName"), s("model"), s("manufacturer"), s("serialNumber"),
    s("userDisplayName"), s("managedDeviceName"),
    s("managementCertificateExpirationDate"), s("joinType"), s("skuFamily"),
    b("autopilotEnrolled"),
    StructField("configurationManagerClientHealthState", StructType(Seq(
      s("state"), StructField("errorCode", LongType), s("lastSyncDateTime")))),
    StructField("usersLoggedOn", ArrayType(StructType(Seq(
      s("userId"), s("lastLogOnDateTime")))))))

  /** ManagedDevices with the `detectedApps` navigation property
    * expanded ($expand, O4 — the URL slot the reference declares at
    * MD-PS:70-80): the expanded objects arrive as an array of nested
    * structs alongside the entity's own fields. Field shape is the
    * public Graph detectedApp resource. */
  val managedDeviceExpandSource: StructType = StructType(Seq(
    s("id"), s("deviceName"), s("operatingSystem"),
    StructField("detectedApps", ArrayType(StructType(Seq(
      s("id"), s("displayName"), s("version"),
      StructField("sizeInByte", LongType)))))))

  /** Sink: 25 passthrough + 5 derived + timeGenerated (MD-SQL:7-40).
    * The lowercase-l in configurationManagerClientlastSyncDateTime is the
    * reference's preserved typo (MD-SQL:31). */
  val managedDeviceSink: StructType = StructType(Seq(
    s("id"), s("userId"), s("deviceName"), s("managedDeviceOwnerType"),
    ts("enrolledDateTime"), ts("lastSyncDateTime"),
    s("complianceState"), s("managementAgent"), s("osVersion"),
    b("azureADRegistered"), s("deviceEnrollmentType"), s("emailAddress"),
    s("azureADDeviceId"), s("deviceRegistrationState"), b("isEncrypted"),
    s("userPrincipalName"), s("model"), s("manufacturer"), s("serialNumber"),
    s("userDisplayName"), s("managedDeviceName"),
    ts("managementCertificateExpirationDate"), s("joinType"), s("skuFamily"),
    b("autopilotEnrolled"),
    s("configurationManagerClientHealthState"),
    StructField("configurationManagerClientErrorCode", LongType),
    ts("configurationManagerClientlastSyncDateTime"),
    s("userLoggedOnUserId"), ts("userLoggedOnLastLogOnDateTime"),
    ts("timeGenerated")))

  // ------------------------------------------------------------ CloudPCs
  /** 15 $select properties (W365-PS:22), no nesting. */
  val cloudPcSource: StructType = StructType(Seq(
    s("id"), s("displayName"), s("imageDisplayName"),
    s("provisioningPolicyId"), s("provisioningPolicyName"),
    s("onPremisesConnectionName"), s("servicePlanId"), s("servicePlanName"),
    s("userPrincipalName"), s("lastModifiedDateTime"),
    s("managedDeviceId"), s("managedDeviceName"), s("aadDeviceId"),
    s("gracePeriodEndDateTime"), s("provisioningType")))

  /** Sink ⊇ extract: servicePlanType / diskEncryptionState / statusDetails
    * / statusDescription are declared but never populated (CPC-SQL:23-27)
    * — they conform to NULL via the absent-column rule (O14). */
  val cloudPcSink: StructType = StructType(Seq(
    s("id"), s("displayName"), s("imageDisplayName"),
    s("provisioningPolicyId"), s("provisioningPolicyName"),
    s("onPremisesConnectionName"), s("servicePlanId"), s("servicePlanName"),
    s("servicePlanType"), s("userPrincipalName"),
    ts("lastModifiedDateTime"), s("managedDeviceId"), s("managedDeviceName"),
    s("aadDeviceId"), ts("gracePeriodEndDateTime"), s("provisioningType"),
    s("diskEncryptionState"), s("statusDetails"), s("statusDescription"),
    ts("timeGenerated")))

  // -------------------------------------------------- CloudPCAuditEvents
  val auditEventSource: StructType = StructType(Seq(
    s("id"), s("displayName"), s("componentName"), s("activityDateTime"),
    s("activityType"), s("activityResult"), s("category"),
    StructField("actor", StructType(Seq(
      s("applicationDisplayName"), s("userPrincipalName")))),
    StructField("resources", ArrayType(StructType(Seq(s("displayName")))))))

  /** Sink: 7 passthrough + 3 derived + timeGenerated (AUD-SQL:7-20). */
  val auditEventSink: StructType = StructType(Seq(
    s("id"), s("displayName"), s("componentName"), ts("activityDateTime"),
    s("activityType"), s("activityResult"), s("category"),
    s("actorApplicationDisplayName"), s("actorUserPrincipalName"),
    s("resourcesDisplayName"), ts("timeGenerated")))
}
