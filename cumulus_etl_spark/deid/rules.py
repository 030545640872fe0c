"""De-identification scrub rules.

Same rule *vocabulary* as the reference's config
(cumulus_etl/deid/scrub-rules.toml header, deid/scrubber.py:110-306) —
an allow-list of fields per node type, where each field maps to either a
leaf ACTION or another NODE type to recurse into — but authored fresh as
Python data for the resource types our schemas cover, and compiled to
Catalyst expressions instead of interpreted per row.

Leaf actions:
- ``val``        keep (strings are trimmed; empties become null)
- ``mask``       drop the value (null)
- ``mask-note``  drop unless the scrubber runs in NLP mode (notes kept)
- ``anon-id``    salted-SHA256 pseudonym
- ``anon-ref``   rewrite ``Type/id`` reference with pseudonymized id
- ``year``       date → 4-char year
- ``zip``        HIPAA zip generalization
- ``philter``    free-text PHI scrub (regex pandas_udf) when enabled, else keep trimmed
- ``check-system;<action>``  apply <action> only if the sibling ``system``
  is trustworthy (Epic custom urn:oid:1.2.840.114350.* systems with
  non-numeric codes are masked; ref scrubber.py:421-467)

Node values: any capitalized name present in NODE_RULES (``CC`` and
``Ref`` are shortcuts). ``_extends`` merges a base node's fields in.
Unlisted fields are dropped — the allow-list IS the projection.
"""

from __future__ import annotations

# Extension URLs that survive de-identification (US Core demographic
# extensions carry analytic value and no direct identifiers).
ALLOWED_EXTENSION_URLS: frozenset[str] = frozenset(
    {
        "http://hl7.org/fhir/us/core/StructureDefinition/us-core-birthsex",
        "http://hl7.org/fhir/us/core/StructureDefinition/us-core-race",
        "http://hl7.org/fhir/us/core/StructureDefinition/us-core-ethnicity",
        "http://hl7.org/fhir/us/core/StructureDefinition/us-core-genderIdentity",
        "http://hl7.org/fhir/StructureDefinition/data-absent-reason",
    }
)

# Modifier extensions we understand (none, currently): any other modifier
# extension vetoes the whole resource, because ignoring a *modifier* would
# change the row's meaning (ref scrubber.py:289-296).
ALLOWED_MODIFIER_EXTENSION_URLS: frozenset[str] = frozenset()

NODE_RULES: dict[str, dict[str, object]] = {
    "Element": {"extension": "Extension"},
    "BackboneElement": {"_extends": "Element", "modifierExtension": "ModifierExtension"},
    "Resource": {"resourceType": "val", "id": "anon-id", "meta": "Meta"},
    "DomainResource": {
        "_extends": "Resource",
        "extension": "Extension",
        "modifierExtension": "ModifierExtension",
    },
    "Meta": {"lastUpdated": "val", "profile": "val", "security": "Coding"},
    "Coding": {
        "_extends": "Element",
        "system": "val",
        "version": "val",
        "code": "check-system;val",
        "display": "check-system;val",
        "userSelected": "val",
    },
    "CodeableConcept": {"_extends": "Element", "coding": "Coding", "text": "philter"},
    "Reference": {"_extends": "Element", "reference": "anon-ref", "type": "val"},
    "Period": {"_extends": "Element", "start": "val", "end": "val"},
    "Quantity": {
        "_extends": "Element",
        "value": "val",
        "comparator": "val",
        "unit": "val",
        "system": "val",
        "code": "val",
    },
    "Range": {"_extends": "Element", "low": "Quantity", "high": "Quantity"},
    "Ratio": {"_extends": "Element", "numerator": "Quantity", "denominator": "Quantity"},
    "Address": {"_extends": "Element", "state": "val", "postalCode": "zip", "country": "val"},
    "Attachment": {
        "_extends": "Element",
        "contentType": "val",
        "language": "val",
        "data": "mask-note",
        "url": "mask-note",
        "size": "val",
        "creation": "val",
    },
    "Annotation": {"_extends": "Element", "time": "val", "text": "philter"},
    # Identifier survives only behind conditional node configs
    # ("Identifier;system=<url>") on non-patient-linked resources
    # (ref scrub-rules.toml:362-369 + Location/Practitioner/Organization).
    "Identifier": {
        "_extends": "Element",
        "use": "val",
        "type": "CC",
        "system": "val",
        "value": "val",
        "period": "Period",
        "assigner": "Ref",
    },
    "Dosage": {
        "_extends": "BackboneElement",
        "sequence": "val",
        "text": "philter",
        "timing": {"code": "CC"},
        "asNeededBoolean": "val",
        "route": "CC",
        "method": "CC",
        "doseAndRate": {"type": "CC", "doseQuantity": "Quantity", "doseRange": "Range"},
    },
    # ---- resources ----
    "Patient": {
        "_extends": "DomainResource",
        "active": "val",
        "gender": "val",
        "birthDate": "year",
        "deceasedBoolean": "val",
        "deceasedDateTime": "year",
        "address": "Address",
        "maritalStatus": "CC",
        "communication": {"language": "CC", "preferred": "val"},
        "generalPractitioner": "Ref",
        "managingOrganization": "Ref",
    },
    "Encounter": {
        "_extends": "DomainResource",
        "status": "val",
        "class": "Coding",
        "type": "CC",
        "serviceType": "CC",
        "priority": "CC",
        "subject": "Ref",
        "participant": {"type": "CC", "period": "Period", "individual": "Ref"},
        "period": "Period",
        "length": "Quantity",
        "reasonCode": "CC",
        "reasonReference": "Ref",
        "diagnosis": {"condition": "Ref", "use": "CC", "rank": "val"},
        "hospitalization": {
            "admitSource": "CC",
            "reAdmission": "CC",
            "dischargeDisposition": "CC",
        },
        "location": {"location": "Ref", "status": "val", "period": "Period"},
        "serviceProvider": "Ref",
        "partOf": "Ref",
    },
    "Condition": {
        "_extends": "DomainResource",
        "clinicalStatus": "CC",
        "verificationStatus": "CC",
        "category": "CC",
        "severity": "CC",
        "code": "CC",
        "bodySite": "CC",
        "subject": "Ref",
        "encounter": "Ref",
        "onsetDateTime": "val",
        "onsetPeriod": "Period",
        "abatementDateTime": "val",
        "recordedDate": "val",
        "recorder": "Ref",
        "asserter": "Ref",
    },
    "Observation": {
        "_extends": "DomainResource",
        "basedOn": "Ref",
        "partOf": "Ref",
        "status": "val",
        "category": "CC",
        "code": "CC",
        "subject": "Ref",
        "encounter": "Ref",
        "effectiveDateTime": "val",
        "effectivePeriod": "Period",
        "issued": "val",
        "valueQuantity": "Quantity",
        "valueCodeableConcept": "CC",
        # the reference masks free-text observation values outright
        # (scrub-rules.toml:566,588) rather than philtering them
        "valueString": "mask",
        "valueBoolean": "val",
        "valueInteger": "val",
        "valueRange": "Range",
        "valueRatio": "Ratio",
        "valueDateTime": "val",
        "dataAbsentReason": "CC",
        "interpretation": "CC",
        "bodySite": "CC",
        "method": "CC",
        "referenceRange": {"low": "Quantity", "high": "Quantity", "type": "CC", "text": "philter"},
        "hasMember": "Ref",
        "derivedFrom": "Ref",
        "component": {
            "code": "CC",
            "valueQuantity": "Quantity",
            "valueCodeableConcept": "CC",
            "valueString": "mask",
            "dataAbsentReason": "CC",
        },
    },
    "DocumentReference": {
        "_extends": "DomainResource",
        "status": "val",
        "docStatus": "val",
        "type": "CC",
        "category": "CC",
        "subject": "Ref",
        "date": "val",
        "author": "Ref",
        "custodian": "Ref",
        "content": {"attachment": "Attachment", "format": "Coding"},
        "context": {
            "encounter": "Ref",
            "event": "CC",
            "period": "Period",
            "facilityType": "CC",
            "practiceSetting": "CC",
        },
    },
    "DiagnosticReport": {
        "_extends": "DomainResource",
        "basedOn": "Ref",
        "status": "val",
        "category": "CC",
        "code": "CC",
        "subject": "Ref",
        "encounter": "Ref",
        "effectiveDateTime": "val",
        "effectivePeriod": "Period",
        "issued": "val",
        "result": "Ref",
        "presentedForm": "Attachment",
    },
    "MedicationRequest": {
        "_extends": "DomainResource",
        "status": "val",
        "statusReason": "CC",
        "intent": "val",
        "category": "CC",
        "priority": "val",
        "reportedBoolean": "val",
        "medicationCodeableConcept": "CC",
        "medicationReference": "Ref",
        "subject": "Ref",
        "encounter": "Ref",
        "authoredOn": "val",
        "requester": "Ref",
        "reasonCode": "CC",
        "reasonReference": "Ref",
        "courseOfTherapyType": "CC",
        "dosageInstruction": "Dosage",
    },
    "Medication": {
        "_extends": "DomainResource",
        "code": "CC",
        "status": "val",
        "form": "CC",
        "ingredient": {
            "itemCodeableConcept": "CC",
            "itemReference": "Ref",
            "isActive": "val",
            "strength": "Ratio",
        },
    },
    "AllergyIntolerance": {
        "_extends": "DomainResource",
        "clinicalStatus": "CC",
        "verificationStatus": "CC",
        "type": "val",
        "category": "val",
        "criticality": "val",
        "code": "CC",
        "patient": "Ref",
        "encounter": "Ref",
        "onsetDateTime": "val",
        "recordedDate": "val",
        "recorder": "Ref",
        "asserter": "Ref",
        "lastOccurrence": "val",
        "reaction": {
            "substance": "CC",
            "manifestation": "CC",
            "onset": "val",
            "severity": "val",
            "exposureRoute": "CC",
        },
    },
    "Immunization": {
        "_extends": "DomainResource",
        "status": "val",
        "statusReason": "CC",
        "vaccineCode": "CC",
        "patient": "Ref",
        "encounter": "Ref",
        "occurrenceDateTime": "val",
        "recorded": "val",
        "primarySource": "val",
        "site": "CC",
        "route": "CC",
        "doseQuantity": "Quantity",
    },
    "Procedure": {
        "_extends": "DomainResource",
        "status": "val",
        "statusReason": "CC",
        "category": "CC",
        "code": "CC",
        "subject": "Ref",
        "encounter": "Ref",
        "performedDateTime": "val",
        "performedPeriod": "Period",
        "recorder": "Ref",
        "asserter": "Ref",
        "performer": {"function": "CC", "actor": "Ref"},
        "reasonCode": "CC",
        "reasonReference": "Ref",
        "bodySite": "CC",
        "outcome": "CC",
    },
    "ServiceRequest": {
        "_extends": "DomainResource",
        "status": "val",
        "intent": "val",
        "category": "CC",
        "priority": "val",
        "code": "CC",
        "subject": "Ref",
        "encounter": "Ref",
        "occurrenceDateTime": "val",
        "occurrencePeriod": "Period",
        "authoredOn": "val",
        "requester": "Ref",
        "performer": "Ref",
        "reasonCode": "CC",
        "reasonReference": "Ref",
    },
    "Practitioner": {
        # not patient-linked but still a person: NPI identifiers only
        # (ref scrub-rules.toml:653-669)
        "_extends": "DomainResource",
        "identifier": "Identifier;system=http://hl7.org/fhir/sid/us-npi",
        "active": "val",
        "address": "Address",
        "gender": "val",
        "birthDate": "year",
        "qualification": {
            "identifier": "Identifier",
            "code": "CC",
            "period": "Period",
            "issuer": "Ref",
        },
        "communication": "CC",
    },
    "PractitionerRole": {
        "_extends": "DomainResource",
        "identifier": "Identifier;system=http://hl7.org/fhir/sid/us-npi",
        "active": "val",
        "period": "Period",
        "practitioner": "Ref",
        "organization": "Ref",
        "code": "CC",
        "specialty": "CC",
        "location": "Ref",
        "healthcareService": "Ref",
        "availableTime": {
            "daysOfWeek": "val",
            "allDay": "val",
            "availableStartTime": "val",
            "availableEndTime": "val",
        },
        "notAvailable": {"during": "Period"},
        "endpoint": "Ref",
    },
    "Organization": {
        # US Core org identifier systems (NPI, CLIA, NAIC) allowed
        # (ref scrub-rules.toml:601-617)
        "_extends": "DomainResource",
        "identifier": (
            "Identifier;system=http://hl7.org/fhir/sid/us-npi"
            ";system=urn:oid:2.16.840.1.113883.4.7"
            ";system=urn:oid:2.16.840.1.113883.6.300"
        ),
        "active": "val",
        "type": "CC",
        "name": "val",
        "alias": "val",
        "address": "Address",
        "partOf": "Ref",
        "contact": {"purpose": "CC", "address": "Address"},
        "endpoint": "Ref",
    },
    "Device": {
        # ref scrub-rules.toml:124-159 (freeform device strings are
        # non-PHI per the reference's commentary; identifier skipped)
        "_extends": "DomainResource",
        "definition": "Ref",
        "udiCarrier": {
            "deviceIdentifier": "val",
            "issuer": "val",
            "jurisdiction": "val",
            "carrierAIDC": "val",
            "carrierHRF": "val",
            "entryType": "val",
        },
        "status": "val",
        "statusReason": "CC",
        "distinctIdentifier": "val",
        "manufacturer": "val",
        "manufactureDate": "val",
        "expirationDate": "val",
        "lotNumber": "val",
        "serialNumber": "val",
        "deviceName": {"name": "val", "type": "val"},
        "modelNumber": "val",
        "partNumber": "val",
        "type": "CC",
        "specialization": {"systemType": "CC", "version": "val"},
        "version": {"type": "CC", "component": "Identifier", "value": "val"},
        "property": {"type": "CC", "valueQuantity": "Quantity", "valueCode": "CC"},
        "patient": "Ref",
        "owner": "Ref",
        "location": "Ref",
    },
    "EpisodeOfCare": {
        # ref scrub-rules.toml:290-306
        "_extends": "DomainResource",
        "status": "val",
        "statusHistory": {"status": "val", "period": "Period"},
        "type": "CC",
        "diagnosis": {"condition": "Ref", "role": "CC", "rank": "val"},
        "patient": "Ref",
        "managingOrganization": "Ref",
        "period": "Period",
        "referralRequest": "Ref",
        "careManager": "Ref",
        "team": "Ref",
        "account": "Ref",
    },
    "Location": {
        # not patient-linked: NPI identifiers + address allowed
        # (ref scrub-rules.toml:415-437)
        "_extends": "DomainResource",
        "identifier": "Identifier;system=http://hl7.org/fhir/sid/us-npi",
        "status": "val",
        "operationalStatus": "Coding",
        "name": "val",
        "alias": "val",
        "mode": "val",
        "type": "CC",
        "address": "Address",
        "physicalType": "CC",
        "managingOrganization": "Ref",
        "partOf": "Ref",
        "hoursOfOperation": {
            "daysOfWeek": "val",
            "allDay": "val",
            "openingTime": "val",
            "closingTime": "val",
        },
        "endpoint": "Ref",
    },
    "MedicationDispense": {
        # ref scrub-rules.toml:454-485
        "_extends": "DomainResource",
        "partOf": "Ref",
        "status": "val",
        "statusReasonCodeableConcept": "CC",
        "statusReasonReference": "Ref",
        "category": "CC",
        "medicationCodeableConcept": "CC",
        "medicationReference": "Ref",
        "subject": "Ref",
        "context": "Ref",
        "supportingInformation": "Ref",
        "performer": {"function": "CC", "actor": "Ref"},
        "location": "Ref",
        "authorizingPrescription": "Ref",
        "type": "CC",
        "quantity": "Quantity",
        "daysSupply": "Quantity",
        "whenPrepared": "val",
        "whenHandedOver": "val",
        "destination": "Ref",
        "receiver": "Ref",
        "dosageInstruction": "Dosage",
        "substitution": {
            "wasSubstituted": "val",
            "type": "CC",
            "reason": "CC",
            "responsibleParty": "Ref",
        },
        "detectedIssue": "Ref",
        "eventHistory": "Ref",
    },
    "Specimen": {
        # ref scrub-rules.toml:826-855 (identifier/accessionIdentifier/
        # notes/descriptions skipped)
        "_extends": "DomainResource",
        "status": "val",
        "type": "CC",
        "subject": "Ref",
        "receivedTime": "val",
        "parent": "Ref",
        "request": "Ref",
        "collection": {
            "collector": "Ref",
            "collectedDateTime": "val",
            "collectedPeriod": "Period",
            "duration": "Quantity",
            "quantity": "Quantity",
            "method": "CC",
            "bodySite": "CC",
            "fastingStatusCodeableConcept": "CC",
            "fastingStatusDuration": "Quantity",
        },
        "processing": {
            "procedure": "CC",
            "additive": "Ref",
            "timeDateTime": "val",
            "timePeriod": "Period",
        },
        "container": {
            "type": "CC",
            "capacity": "Quantity",
            "specimenQuantity": "Quantity",
            "additiveCodeableConcept": "CC",
            "additiveReference": "Ref",
        },
        "condition": "CC",
    },
}

_SHORTCUTS = {"CC": "CodeableConcept", "Ref": "Reference"}


def resolve_node(name: str) -> dict[str, object]:
    """Node rules with the ``_extends`` chain merged (subclass wins)."""
    name = _SHORTCUTS.get(name, name)
    rules = NODE_RULES[name]
    base_name = rules.get("_extends")
    merged: dict[str, object] = {}
    if isinstance(base_name, str):
        merged.update(resolve_node(base_name))
    merged.update({k: v for k, v in rules.items() if k != "_extends"})
    return merged
