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
        "valueString": "philter",
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
            "valueString": "philter",
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
        "dosageInstruction": {
            "sequence": "val",
            "text": "philter",
            "timing": {"code": "CC"},
            "asNeededBoolean": "val",
            "route": "CC",
            "method": "CC",
            "doseAndRate": {"type": "CC", "doseQuantity": "Quantity", "doseRange": "Range"},
        },
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
        "_extends": "DomainResource",
        "active": "val",
        "gender": "val",
        "qualification": {"code": "CC", "period": "Period", "issuer": "Ref"},
    },
    "PractitionerRole": {
        "_extends": "DomainResource",
        "active": "val",
        "period": "Period",
        "practitioner": "Ref",
        "organization": "Ref",
        "code": "CC",
        "specialty": "CC",
    },
    "Organization": {
        "_extends": "DomainResource",
        "active": "val",
        "type": "CC",
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
