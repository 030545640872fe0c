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
