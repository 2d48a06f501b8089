package graft.pipeline

/** The silver-layer snake_case rename maps — 141 old→new mappings across 8
  * tables, reproduced from `linehaul_bronze_silver.py:9-167` (identical in
  * `mm_bronze_silver.py`).
  *
  * The reference applies *every* table's map to *every* DataFrame through a
  * 141-iteration `withColumnRenamed` loop
  * (`linehaul_bronze_silver.py:225-227`) — safe only because renames of
  * absent columns no-op and the shared keys (`claimnumber`, `accountid`,
  * `datecreated`, `rowid`) map to identical targets, but O(renames) in
  * analyzer work. [[Medallion.applyRenames]] collapses it to a single
  * `select` projection.
  */
object RenameMaps {
  val claim: Map[String, String] = Map(
    "claimid" -> "claim_id", "accountid" -> "account_id",
    "claimnumber" -> "claim_number", "claimtype" -> "claim_type",
    "statuscodeid" -> "status_code_id", "statuscode" -> "status_code",
    "reasoncodeid" -> "reason_code_id", "reason" -> "reason",
    "claimrep" -> "claim_rep", "company" -> "company",
    "companycode" -> "company_code", "claimant" -> "claim_ant",
    "claimantcode" -> "claim_ant_code", "claimantline1" -> "claim_ant_line1",
    "claimantline2" -> "claim_ant_line2", "claimantline3" -> "claim_ant_line3",
    "contact" -> "contact", "claimantcontactphone" -> "claim_ant_contact_phone",
    "shipper" -> "shipper", "shippercode" -> "shipper_code",
    "shipperline1" -> "shipper_line1", "shipperline2" -> "shipper_line2",
    "shipperline3" -> "shipper_line3", "deliverydate" -> "delivery_date",
    "shipmentdate" -> "shipment_date", "billladingcarrier" -> "bill_lading_carrier",
    "deliverycarrier" -> "delivery_carrier", "carrierclaimnumber" -> "carrier_claim_number",
    "carrierbol" -> "carrier_bol", "carrierscac" -> "carrier_scac",
    "carrier" -> "carrier", "carriercode" -> "carrier_code",
    "carrierline1" -> "carrier_line1", "carrierline2" -> "carrier_line2",
    "carrierline3" -> "carrier_line3", "customer" -> "customer",
    "customercode" -> "customer_code", "customerline1" -> "customer_line1",
    "customerline2" -> "customer_line2", "customerline3" -> "customer_line3",
    "originterminal" -> "origin_terminal", "originliabilitypct" -> "origin_liability_pct",
    "destinationterminal" -> "destination_terminal",
    "destinationliabilitypct" -> "destination_liability_pct",
    "legalliabilityreserves" -> "legal_liability_reserves",
    "transmittalamount" -> "transmittal_amount", "deniedamount" -> "denied_amount",
    "freightamount" -> "freight_amount", "addlchargesamount" -> "addl_charges_amount",
    "totalamount" -> "total_amount", "paymentamount" -> "payment_amount",
    "outstandingamount" -> "outstanding_amount", "updatedate" -> "update_date",
    "datecreated" -> "date_created", "datefiled" -> "date_filed",
    "datemailed" -> "date_mailed", "dateacknowledged" -> "date_acknowledged",
    "dateclosed" -> "date_closed", "datepaid" -> "date_paid",
    "datereopened" -> "date_reopened", "osdsubmitdate" -> "osd_submit_date",
    "datereimburse" -> "date_reimburse", "comments" -> "comments",
    "transportationmode" -> "transportation_mode", "vehiclenumber" -> "vehicle_number",
    "inoutbound" -> "in_out_bound", "datecancelled" -> "date_cancelled",
    "cancelreason" -> "cancel_reason", "daterejected" -> "date_rejected",
    "rejectedreason" -> "rejected_reason", "datedenied" -> "date_denied",
    "denialreason" -> "denial_reason", "dateapproval" -> "date_approval",
    "approvalreason" -> "approval_reason", "claimgroup" -> "claim_group")

  val claimActivities: Map[String, String] = Map(
    "rowid" -> "row_id", "claimnumber" -> "claim_number", "display" -> "display",
    "dateof" -> "date_of", "accountid" -> "account_id", "datecreated" -> "date_created")

  val claimAdditionalCharges: Map[String, String] = Map(
    "rowid" -> "row_id", "claimnumber" -> "claim_number", "chargetype" -> "charge_type",
    "description" -> "description", "amount" -> "amount",
    "accountid" -> "account_id", "datecreated" -> "date_created")

  val claimAdditionalInfo: Map[String, String] = Map(
    "rowid" -> "row_id", "claimnumber" -> "claim_number", "customfield" -> "custom_field",
    "value" -> "value", "accountid" -> "account_id", "datecreated" -> "date_created")

  val claimDiary: Map[String, String] = Map(
    "rowid" -> "row_id", "claimnumber" -> "claim_number", "dateof" -> "date_of",
    "lastupdatedname" -> "last_updated_name", "category" -> "category",
    "comments" -> "comments", "accountid" -> "account_id")

  val claimDocuments: Map[String, String] = Map(
    "rowid" -> "row_id", "claimnumber" -> "claim_number", "display" -> "display",
    "value" -> "value", "dateof" -> "date_of", "accountid" -> "account_id",
    "datecreated" -> "date_created")

  val claimPayments: Map[String, String] = Map(
    "rowid" -> "row_id", "claimnumber" -> "claim_number", "payee" -> "payee",
    "payeecode" -> "payee_code", "payeeline1" -> "payee_line1",
    "payeeline2" -> "payee_line2", "payeeline3" -> "payee_line3",
    "paymenttype" -> "payment_type", "paymentamount" -> "payment_amount",
    "paymentdate" -> "payment_date", "comments" -> "comments",
    "requestedby" -> "requested_by", "requestdate" -> "request_date",
    "approvedby" -> "approved_by", "approvaldate" -> "approval_date",
    "checknumber" -> "check_number", "checkdate" -> "check_date",
    "transtype" -> "trans_type", "transnumber" -> "trans_number",
    "transdate" -> "trans_date", "accountid" -> "account_id",
    "datecreated" -> "date_created")

  val claimProducts: Map[String, String] = Map(
    "rowid" -> "row_id", "claimnumber" -> "claim_number", "itemnumber" -> "item_number",
    "description" -> "description", "NMFC" -> "NMFC", "quantity" -> "quantity",
    "unitcost" -> "unit_cost", "weight" -> "weight", "linetotal" -> "line_total",
    "accountid" -> "account_id", "datecreated" -> "date_created")

  /** Keyed as in the reference dict (`linehaul_bronze_silver.py:9-167`). */
  val all: Map[String, Map[String, String]] = Map(
    "claim" -> claim,
    "claim_activities" -> claimActivities,
    "claim_additional_charges" -> claimAdditionalCharges,
    "claim_additional_info" -> claimAdditionalInfo,
    "claim_diary" -> claimDiary,
    "claim_documents" -> claimDocuments,
    "claim_payments" -> claimPayments,
    "claim_products" -> claimProducts)

  /** The union the reference effectively applies (every map against every
    * table). Shared keys map to identical targets, so the union is
    * well-defined. */
  val merged: Map[String, String] = all.values.reduce(_ ++ _)
}
