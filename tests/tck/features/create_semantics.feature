Feature: CREATE clause semantics

  Scenario: CREATE a single node and read it back
    Given an empty graph
    And having executed:
      """
      CREATE (:Person {name: 'Ada', age: 36})
      """
    When executing query:
      """
      MATCH (p:Person) RETURN p.name AS name, p.age AS age
      """
    Then the result should be, in any order:
      | name  | age |
      | 'Ada' | 36  |

  Scenario: CREATE multiple nodes in one pattern
    Given an empty graph
    And having executed:
      """
      CREATE (:A {v: 1}), (:A {v: 2}), (:B {v: 3})
      """
    When executing query:
      """
      MATCH (n:A) RETURN count(*) AS c
      """
    Then the result should be, in any order:
      | c |
      | 2 |

  Scenario: CREATE a full path creates both endpoints and the relationship
    Given an empty graph
    And having executed:
      """
      CREATE (:X {v: 1})-[:R {w: 9}]->(:Y {v: 2})
      """
    When executing query:
      """
      MATCH (a:X)-[r:R]->(b:Y)
      RETURN a.v AS av, r.w AS rw, b.v AS bv
      """
    Then the result should be, in any order:
      | av | rw | bv |
      | 1  | 9  | 2  |

  Scenario: CREATE always creates, never matches
    Given an empty graph
    And having executed:
      """
      CREATE (:D {k: 1})
      """
    And having executed:
      """
      CREATE (:D {k: 1})
      """
    When executing query:
      """
      MATCH (d:D {k: 1}) RETURN count(*) AS c
      """
    Then the result should be, in any order:
      | c |
      | 2 |

  Scenario: CREATE RETURN projects the created node in the same statement
    Given an empty graph
    When executing query:
      """
      CREATE (p:Person {name: 'Gr', age: 1})
      RETURN p.name AS name
      """
    Then the result should be, in any order:
      | name |
      | 'Gr' |

  Scenario: CREATE relationship between previously matched endpoints
    Given an empty graph
    And having executed:
      """
      CREATE (:S {k: 1}), (:T {k: 2})
      """
    And having executed:
      """
      MATCH (s:S), (t:T) CREATE (s)-[:LINK]->(t)
      """
    When executing query:
      """
      MATCH (:S)-[r:LINK]->(:T) RETURN count(r) AS c
      """
    Then the result should be, in any order:
      | c |
      | 1 |

  Scenario: UNWIND CREATE creates one node per list element
    Given an empty graph
    And having executed:
      """
      UNWIND [10, 20, 30] AS v CREATE (:N {v: v})
      """
    When executing query:
      """
      MATCH (n:N) RETURN sum(n.v) AS total, count(*) AS c
      """
    Then the result should be, in any order:
      | total | c |
      | 60    | 3 |

  Scenario: CREATE node with multiple labels is visible from each label
    Given an empty graph
    And having executed:
      """
      CREATE (:Alpha:Beta {v: 7})
      """
    When executing query:
      """
      MATCH (a:Alpha) MATCH (b:Beta)
      RETURN a.v AS av, b.v AS bv
      """
    Then the result should be, in any order:
      | av | bv |
      | 7  | 7  |

  Scenario: CREATE with property computed from an expression
    Given an empty graph
    And having executed:
      """
      CREATE (:Calc {v: 2 * 3 + 1, s: toUpper('ab')})
      """
    When executing query:
      """
      MATCH (c:Calc) RETURN c.v AS v, c.s AS s
      """
    Then the result should be, in any order:
      | v | s    |
      | 7 | 'AB' |

  Scenario: CREATE after WITH uses the piped value
    Given an empty graph
    And having executed:
      """
      WITH 5 AS x CREATE (:W {v: x * 2})
      """
    When executing query:
      """
      MATCH (w:W) RETURN w.v AS v
      """
    Then the result should be, in any order:
      | v  |
      | 10 |

  Scenario: MATCH CREATE multiplies by matched rows
    Given an empty graph
    And having executed:
      """
      CREATE (:Seed {v: 1}), (:Seed {v: 2}), (:Seed {v: 3})
      """
    And having executed:
      """
      MATCH (s:Seed) CREATE (:Copy {v: s.v})
      """
    When executing query:
      """
      MATCH (c:Copy) RETURN count(*) AS c, sum(c.v) AS total
      """
    Then the result should be, in any order:
      | c | total |
      | 3 | 6     |

  Scenario: CREATE two relationships from one node in one pattern
    Given an empty graph
    And having executed:
      """
      CREATE (:L {v: 1})<-[:IN]-(:Hub {v: 0})-[:OUT]->(:R {v: 2})
      """
    When executing query:
      """
      MATCH (h:Hub)-[:OUT]->(r:R), (h)-[:IN]->(l:L)
      RETURN l.v AS lv, h.v AS hv, r.v AS rv
      """
    Then the result should be, in any order:
      | lv | hv | rv |
      | 1  | 0  | 2  |

  Scenario: Created relationship properties are readable
    Given an empty graph
    And having executed:
      """
      CREATE (:P1)-[:REL {since: 2020, active: true}]->(:P2)
      """
    When executing query:
      """
      MATCH ()-[r:REL]->() RETURN r.since AS since, r.active AS active
      """
    Then the result should be, in any order:
      | since | active |
      | 2020  | true   |

  Scenario: CREATE with null property stores no property
    Given an empty graph
    And having executed:
      """
      CREATE (:NP {a: 1, b: null})
      """
    When executing query:
      """
      MATCH (n:NP) RETURN n.a AS a, n.b IS NULL AS b_null, size(keys(n)) AS nk
      """
    Then the result should be, in any order:
      | a | b_null | nk |
      | 1 | true   | 1  |
