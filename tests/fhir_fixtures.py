"""Synthetic FHIR NDJSON fixtures for engine tests.

Hand-written minimal-but-realistic resources (NOT copied from the
reference's test data) exercising nested structs, arrays of structs,
references, attachments, and PHI-bearing fields.
"""

from __future__ import annotations

import json
import os

PATIENTS = [
    {
        "resourceType": "Patient",
        "id": "pat-1",
        "meta": {"lastUpdated": "2021-03-01T10:00:00Z"},
        "name": [{"use": "official", "family": "Smith", "given": ["Jane", "Q"]}],
        "telecom": [{"system": "phone", "value": "555-867-5309"}],
        "gender": "female",
        "birthDate": "1980-06-15",
        "address": [
            {"line": ["1 Main St"], "city": "Boston", "state": "MA", "postalCode": "02115"}
        ],
        "maritalStatus": {
            "coding": [{"system": "http://hl7.org/fhir/v3/MaritalStatus", "code": "M"}],
            "text": "Married",
        },
        "extension": [
            {
                "url": "http://hl7.org/fhir/us/core/StructureDefinition/us-core-birthsex",
                "valueCode": "F",
            },
            {"url": "https://example.com/private-tag", "valueString": "secret"},
        ],
    },
    {
        "resourceType": "Patient",
        "id": "pat-2",
        "gender": "male",
        "birthDate": "1975-01-02",
        "address": [{"postalCode": "03601", "state": "NH"}],
    },
]

ENCOUNTERS = [
    {
        "resourceType": "Encounter",
        "id": "enc-1",
        "meta": {"lastUpdated": "2021-03-02T08:30:00Z"},
        "status": "finished",
        "class": {"system": "http://terminology.hl7.org/CodeSystem/v3-ActCode", "code": "AMB"},
        "subject": {"reference": "Patient/pat-1"},
        "period": {"start": "2021-02-01T09:00:00Z", "end": "2021-02-01T10:00:00Z"},
        "reasonCode": [{"coding": [{"system": "http://snomed.info/sct", "code": "386661006"}]}],
    },
    {
        "resourceType": "Encounter",
        "id": "enc-2",
        "status": "in-progress",
        "class": {"code": "IMP"},
        "subject": {"reference": "Patient/pat-2"},
    },
]

CONDITIONS = [
    {
        "resourceType": "Condition",
        "id": "con-1",
        "code": {
            "coding": [
                {"system": "http://snomed.info/sct", "code": "44054006", "display": "Diabetes"}
            ],
            "text": "Type 2 diabetes, call 555-867-5309",
        },
        "subject": {"reference": "Patient/pat-1"},
        "encounter": {"reference": "Encounter/enc-1"},
        "recordedDate": "2021-02-01T09:30:00Z",
    }
]

DOCREFS = [
    {
        "resourceType": "DocumentReference",
        "id": "doc-1",
        "status": "current",
        "type": {"coding": [{"system": "http://loinc.org", "code": "18842-5"}]},
        "subject": {"reference": "Patient/pat-1"},
        "date": "2021-02-01T11:00:00Z",
        "context": {"encounter": [{"reference": "Encounter/enc-1"}]},
        "content": [
            {
                "attachment": {
                    "contentType": "text/plain",
                    # base64("Patient complains of cough. Contact jane@example.com")
                    "data": "UGF0aWVudCBjb21wbGFpbnMgb2YgY291Z2guIENvbnRhY3QgamFuZUBleGFtcGxlLmNvbQ==",
                }
            }
        ],
    },
    {
        "resourceType": "DocumentReference",
        "id": "doc-2",
        "status": "current",
        "subject": {"reference": "Patient/pat-2"},
        "content": [{"attachment": {"contentType": "text/plain", "url": "https://blob/123"}}],
    },
]


# One small resource per remaining basic-task type (device, episode,
# location, meds-dispense, org, practitioner(+role), specimen).
EXTRA_RESOURCES = [
    {
        "resourceType": "Device",
        "id": "dev-1",
        "status": "active",
        "manufacturer": "Acme Medical",
        "serialNumber": "SN-001",
        "deviceName": [{"name": "Infusion Pump 3000", "type": "user-friendly-name"}],
        "type": {"coding": [{"system": "http://snomed.info/sct", "code": "25062003"}]},
        "patient": {"reference": "Patient/pat-1"},
    },
    {
        "resourceType": "EpisodeOfCare",
        "id": "eoc-1",
        "status": "active",
        "statusHistory": [{"status": "planned", "period": {"start": "2021-01-01"}}],
        "diagnosis": [{"condition": {"reference": "Condition/con-1"}, "rank": 1}],
        "patient": {"reference": "Patient/pat-1"},
        "period": {"start": "2021-01-15"},
    },
    {
        "resourceType": "Location",
        "id": "loc-1",
        "identifier": [
            {"system": "http://hl7.org/fhir/sid/us-npi", "value": "1234567890"},
            {"system": "https://hospital.example.com/internal", "value": "WARD-7"},
        ],
        "status": "active",
        "name": "Main Campus ED",
        "mode": "instance",
        "address": {"city": "Boston", "state": "MA", "postalCode": "02115"},
        "managingOrganization": {"reference": "Organization/org-1"},
    },
    {
        "resourceType": "MedicationDispense",
        "id": "md-1",
        "status": "completed",
        "medicationCodeableConcept": {
            "coding": [{"system": "http://www.nlm.nih.gov/research/umls/rxnorm", "code": "313782"}]
        },
        "subject": {"reference": "Patient/pat-1"},
        "context": {"reference": "Encounter/enc-1"},
        "quantity": {"value": 30.0, "unit": "tablets"},
        "whenHandedOver": "2021-02-02T15:00:00Z",
        "dosageInstruction": [{"sequence": 1, "text": "One tablet daily"}],
    },
    {
        "resourceType": "Organization",
        "id": "org-1",
        "identifier": [
            {"system": "urn:oid:2.16.840.1.113883.4.7", "value": "11D1111111"},
            {"system": "https://hospital.example.com/payroll", "value": "P-42"},
        ],
        "active": True,
        "name": "Example Hospital",
        "address": [{"state": "MA", "postalCode": "02115"}],
    },
    {
        "resourceType": "Practitioner",
        "id": "prac-1",
        "identifier": [{"system": "http://hl7.org/fhir/sid/us-npi", "value": "9988776655"}],
        "active": True,
        "name": [{"family": "House", "given": ["Gregory"]}],
        "gender": "male",
        "birthDate": "1959-06-11",
        "qualification": [
            {"code": {"coding": [{"system": "http://terminology.hl7.org/CodeSystem/v2-0360", "code": "MD"}]}}
        ],
    },
    {
        "resourceType": "PractitionerRole",
        "id": "pr-1",
        "active": True,
        "practitioner": {"reference": "Practitioner/prac-1"},
        "organization": {"reference": "Organization/org-1"},
        "specialty": [{"coding": [{"system": "http://snomed.info/sct", "code": "394802001"}]}],
    },
    {
        "resourceType": "Specimen",
        "id": "spec-1",
        "accessionIdentifier": {"system": "https://lab.example.com", "value": "ACC-99"},
        "status": "available",
        "type": {"coding": [{"system": "http://snomed.info/sct", "code": "119361006"}]},
        "subject": {"reference": "Patient/pat-1"},
        "receivedTime": "2021-02-01T12:00:00Z",
        "collection": {
            "collector": {"reference": "Practitioner/prac-1"},
            "collectedDateTime": "2021-02-01T11:45:00Z",
            "bodySite": {"coding": [{"system": "http://snomed.info/sct", "code": "368208006"}]},
        },
    },
]


def write_ndjson(dirpath: str, filename: str, rows: list[dict]) -> str:
    os.makedirs(dirpath, exist_ok=True)
    path = os.path.join(dirpath, filename)
    with open(path, "w") as fh:
        for row in rows:
            fh.write(json.dumps(row) + "\n")
    return path


def write_standard_input(root: str) -> str:
    """Write the standard 4-resource fixture tree; returns the root."""
    write_ndjson(root, "patients.ndjson", PATIENTS)
    write_ndjson(root, "encounters.ndjson", ENCOUNTERS)
    write_ndjson(root, "conditions.ndjson", CONDITIONS)
    write_ndjson(root, "docrefs.ndjson", DOCREFS)
    return root


def write_wide_input(root: str) -> str:
    """The standard tree plus one resource of every remaining basic-task
    type — covers all 20 task types end-to-end."""
    write_standard_input(root)
    write_ndjson(root, "extra.ndjson", EXTRA_RESOURCES)
    # minimal instances of the remaining standard types
    write_ndjson(root, "more.ndjson", [
        {"resourceType": "AllergyIntolerance", "id": "ai-1",
         "code": {"coding": [{"system": "http://snomed.info/sct", "code": "91936005"}]},
         "patient": {"reference": "Patient/pat-1"}},
        {"resourceType": "DiagnosticReport", "id": "dr-1", "status": "final",
         "code": {"coding": [{"system": "http://loinc.org", "code": "58410-2"}]},
         "subject": {"reference": "Patient/pat-1"}},
        {"resourceType": "Immunization", "id": "imm-1", "status": "completed",
         "vaccineCode": {"coding": [{"system": "http://hl7.org/fhir/sid/cvx", "code": "208"}]},
         "patient": {"reference": "Patient/pat-1"}},
        {"resourceType": "Medication", "id": "med-1",
         "code": {"coding": [{"system": "http://www.nlm.nih.gov/research/umls/rxnorm", "code": "313782"}]}},
        {"resourceType": "MedicationRequest", "id": "mr-1", "status": "active",
         "intent": "order", "medicationReference": {"reference": "Medication/med-1"},
         "subject": {"reference": "Patient/pat-1"}},
        {"resourceType": "Observation", "id": "obs-1", "status": "final",
         "code": {"coding": [{"system": "http://loinc.org", "code": "8867-4"}]},
         "subject": {"reference": "Patient/pat-1"}, "valueQuantity": {"value": 72.0, "unit": "bpm"}},
        {"resourceType": "Procedure", "id": "proc-1", "status": "completed",
         "code": {"coding": [{"system": "http://snomed.info/sct", "code": "80146002"}]},
         "subject": {"reference": "Patient/pat-1"}},
        {"resourceType": "ServiceRequest", "id": "sr-1", "status": "active", "intent": "order",
         "code": {"coding": [{"system": "http://snomed.info/sct", "code": "104326007"}]},
         "subject": {"reference": "Patient/pat-1"}},
    ])
    return root


def expected_anon_id(salt: str, real_id: str) -> str:
    """Python-side mirror of functions/scalars.py:anon_id — HMAC-SHA256
    with the codebook's hex salt as key bytes (utf-8 for non-hex salts)."""
    import binascii
    import hashlib
    import hmac

    try:
        key = binascii.unhexlify(salt)
    except (binascii.Error, ValueError):
        key = salt.encode("utf-8")
    return hmac.new(key, real_id.encode(), hashlib.sha256).hexdigest()
