Feature: Variable-length direction and bound matrix

  Scenario: undirected var-length reaches both ways
    Given an empty graph
    And having executed:
      """
      CREATE (:VD {id: 1})-[:R]->(:VD {id: 2})-[:R]->(:VD {id: 3})
      """
    When executing query:
      """
      MATCH (:VD {id: 2})-[:R*1..1]-(x)
      RETURN x.id AS id ORDER BY id
      """
    Then the result should be, in order:
      | id |
      | 1  |
      | 3  |

  Scenario: incoming var-length walks against the arrows
    Given an empty graph
    And having executed:
      """
      CREATE (:VI {id: 1})-[:R]->(:VI {id: 2})-[:R]->(:VI {id: 3})
      """
    When executing query:
      """
      MATCH (:VI {id: 3})<-[:R*1..2]-(x)
      RETURN x.id AS id ORDER BY id
      """
    Then the result should be, in order:
      | id |
      | 1  |
      | 2  |

  Scenario: exact hop count excludes shorter and longer walks
    Given an empty graph
    And having executed:
      """
      CREATE (:VE {id: 1})-[:R]->(:VE {id: 2})-[:R]->(:VE {id: 3})-[:R]->(:VE {id: 4})
      """
    When executing query:
      """
      MATCH (:VE {id: 1})-[:R*2]->(x)
      RETURN x.id AS id
      """
    Then the result should be, in any order:
      | id |
      | 3  |

  Scenario: zero-to-one hop includes the start itself
    Given an empty graph
    And having executed:
      """
      CREATE (:VZ {id: 1})-[:R]->(:VZ {id: 2})
      """
    When executing query:
      """
      MATCH (:VZ {id: 1})-[:R*0..1]->(x)
      RETURN x.id AS id ORDER BY id
      """
    Then the result should be, in order:
      | id |
      | 1  |
      | 2  |

  Scenario: relationship uniqueness stops cycles from repeating edges
    Given an empty graph
    And having executed:
      """
      CREATE (a:VC {id: 1})-[:R]->(b:VC {id: 2}), (b)-[:R]->(a)
      """
    When executing query:
      """
      MATCH (:VC {id: 1})-[:R*1..4]->(x)
      RETURN x.id AS id ORDER BY id
      """
    Then the result should be, in order:
      | id |
      | 1  |
      | 2  |

  Scenario: multiple relationship types in a var-length union
    Given an empty graph
    And having executed:
      """
      CREATE (:VT {id: 1})-[:A]->(:VT {id: 2})-[:B]->(:VT {id: 3})
      """
    When executing query:
      """
      MATCH (:VT {id: 1})-[:A|B*1..2]->(x)
      RETURN x.id AS id ORDER BY id
      """
    Then the result should be, in order:
      | id |
      | 2  |
      | 3  |

  Scenario: min bound above available depth yields nothing
    Given an empty graph
    And having executed:
      """
      CREATE (:VM {id: 1})-[:R]->(:VM {id: 2})
      """
    When executing query:
      """
      MATCH (:VM {id: 1})-[:R*3..5]->(x)
      RETURN x.id AS id
      """
    Then the result should be empty

  Scenario: var-length between two fixed endpoints checks reachability
    Given an empty graph
    And having executed:
      """
      CREATE (:VF {id: 1})-[:R]->(:VF {id: 2})-[:R]->(:VF {id: 3})
      """
    And having executed:
      """
      CREATE (:VF {id: 9})
      """
    When executing query:
      """
      MATCH (a:VF {id: 1})-[:R*1..3]->(b:VF)
      WHERE b.id IN [3, 9]
      RETURN b.id AS id
      """
    Then the result should be, in any order:
      | id |
      | 3  |

  Scenario: diamond graph yields one row per distinct walk
    Given an empty graph
    And having executed:
      """
      CREATE (a:DI {id: 1}), (b:DI {id: 2}), (c:DI {id: 3}), (d:DI {id: 4})
      """
    And having executed:
      """
      MATCH (a:DI {id: 1}), (b:DI {id: 2}), (c:DI {id: 3}), (d:DI {id: 4})
      CREATE (a)-[:R]->(b), (a)-[:R]->(c), (b)-[:R]->(d), (c)-[:R]->(d)
      """
    When executing query:
      """
      MATCH (:DI {id: 1})-[:R*2]->(x:DI {id: 4})
      RETURN count(*) AS walks
      """
    Then the result should be, in any order:
      | walks |
      | 2     |

  Scenario: length of matched var-length paths per row
    Given an empty graph
    And having executed:
      """
      CREATE (:VL {id: 1})-[:R]->(:VL {id: 2})-[:R]->(:VL {id: 3})
      """
    When executing query:
      """
      MATCH p = (:VL {id: 1})-[:R*1..2]->(x)
      RETURN x.id AS id, length(p) AS len ORDER BY id
      """
    Then the result should be, in order:
      | id | len |
      | 2  | 1   |
      | 3  | 2   |

  Scenario: var-length rel variable is a list of relationships
    Given an empty graph
    And having executed:
      """
      CREATE (:VR {id: 1})-[:R {w: 1}]->(:VR {id: 2})-[:R {w: 2}]->(:VR {id: 3})
      """
    When executing query:
      """
      MATCH (:VR {id: 1})-[rs:R*2]->(:VR {id: 3})
      RETURN size(rs) AS n
      """
    Then the result should be, in any order:
      | n |
      | 2 |

  Scenario: undirected var-length from the middle of a chain counts both arms
    Given an empty graph
    And having executed:
      """
      CREATE (:VU {id: 1})-[:R]->(:VU {id: 2})-[:R]->(:VU {id: 3})-[:R]->(:VU {id: 4})
      """
    When executing query:
      """
      MATCH (:VU {id: 2})-[:R*1..2]-(x)
      RETURN x.id AS id ORDER BY id
      """
    Then the result should be, in order:
      | id |
      | 1  |
      | 3  |
      | 4  |

  Scenario: var-length with per-hop property filter prunes mid-path
    Given an empty graph
    And having executed:
      """
      CREATE (:VP {id: 1})-[:R {ok: true}]->(:VP {id: 2})-[:R {ok: false}]->(:VP {id: 3})
      """
    When executing query:
      """
      MATCH (:VP {id: 1})-[:R*1..2 {ok: true}]->(x)
      RETURN x.id AS id
      """
    Then the result should be, in any order:
      | id |
      | 2  |

  Scenario: chained var-length segments compose
    Given an empty graph
    And having executed:
      """
      CREATE (:CH {id: 1})-[:A]->(:CH {id: 2})-[:B]->(:CH {id: 3})
      """
    When executing query:
      """
      MATCH (:CH {id: 1})-[:A*1..1]->(m)-[:B*1..1]->(x)
      RETURN m.id AS mid, x.id AS xid
      """
    Then the result should be, in any order:
      | mid | xid |
      | 2   | 3   |

  Scenario: var-length to a bound endpoint variable
    Given an empty graph
    And having executed:
      """
      CREATE (:BE {id: 1})-[:R]->(:BE {id: 2})-[:R]->(:BE {id: 3})
      """
    When executing query:
      """
      MATCH (target:BE {id: 3})
      MATCH (:BE {id: 1})-[:R*1..3]->(target)
      RETURN target.id AS id
      """
    Then the result should be, in any order:
      | id |
      | 3  |
